package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Snappy framing walker — round-trip plus one test per malformed /
  * reserved-type class (house rule).
  */
class SnappyFrameOpsSpec extends AnyFunSuite {

  test("round-trip: chunk mix, byte masses, verified CRCs") {
    val m = SnappyFrameOps.parse(
      SnappyFrameOps.encodeSynthetic(Seq(100, 50), Seq(77), padLen = 6))
    assert(m.valid == 1 && m.trailingBytes == 0)
    assert(m.nUncompressed == 2 && m.nCompressed == 1 && m.nPadding == 1)
    assert(m.uncompressedBytes == 150L && m.compressedBytes == 77L)
    assert(m.crcOk == 2 && m.crcBad == 0)
  }

  test("flipped identifier byte: file rejected whole") {
    val b = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    b(5) = 0x7F.toByte
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 0 && m.nUncompressed == 0 && m.trailingBytes == b.length.toLong)
  }

  test("flipped CRC byte: counted, never a halt — framing stays authoritative") {
    val b = SnappyFrameOps.encodeSynthetic(Seq(20, 20), Nil, 0)
    b(14) = (b(14) ^ 0x5A).toByte
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 1 && m.nUncompressed == 2)
    assert(m.crcOk == 1 && m.crcBad == 1)
  }

  test("reserved-unskippable type (0x02): compliant stop, prefix kept") {
    val good = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    val b = good ++ Array(0x02.toByte, 3.toByte, 0.toByte, 0.toByte, 1.toByte, 2.toByte, 3.toByte)
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 0 && m.stoppedUnskippable == 1)
    assert(m.nUncompressed == 1 && m.trailingBytes == 7L)
  }

  test("reserved-skippable type (0x90): stepped over") {
    val good = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    val b = good ++ Array(0x90.toByte, 2.toByte, 0.toByte, 0.toByte, 9.toByte, 9.toByte)
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 1 && m.nSkippable == 1 && m.trailingBytes == 0)
  }

  test("concatenated streams: a repeated identifier is verified and stepped over") {
    // the framing spec permits repeated stream identifiers — `cat a.sz
    // b.sz` must parse whole, the gzip-concatenation pattern
    val a = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    val b = a ++ SnappyFrameOps.encodeSynthetic(Seq(10), Nil, 0)
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 1 && m.nUncompressed == 2 && m.nSkippable == 1)
    assert(m.crcOk == 2 && m.trailingBytes == 0)
  }

  test("a mid-stream identifier with the WRONG payload halts") {
    val a = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    val bad = Array(0xFF.toByte, 6.toByte, 0.toByte, 0.toByte) ++
      "sNaPpX".getBytes("US-ASCII")
    val m = SnappyFrameOps.parse(a ++ bad)
    assert(m.valid == 0 && m.nUncompressed == 1 && m.trailingBytes == 10L)
  }

  test("huge 24-bit length (0xFFFFFF): overflow-proof halt, prefix kept") {
    val good = SnappyFrameOps.encodeSynthetic(Seq(20), Nil, 0)
    val b = good ++ Array(0x01.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val m = SnappyFrameOps.parse(b)
    assert(m.valid == 0 && m.nUncompressed == 1 && m.trailingBytes == 4L)
  }

  test("uncompressed chunk over the 65540-byte spec cap: halt, not alloc") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(SnappyFrameOps.encodeSynthetic(Nil, Nil, 0))
    val len = 70000
    out.write(Array(0x01.toByte, (len & 0xff).toByte,
      ((len >> 8) & 0xff).toByte, ((len >> 16) & 0xff).toByte))
    out.write(new Array[Byte](len))
    val m = SnappyFrameOps.parse(out.toByteArray)
    assert(m.valid == 0 && m.nUncompressed == 0)
  }

  test("3-byte tail truncation: walked prefix kept, per-class trailing") {
    val b = SnappyFrameOps.encodeSynthetic(Seq(20), Seq(30), 0)
    val m = SnappyFrameOps.parse(b.dropRight(3))
    assert(m.valid == 0 && m.nUncompressed == 1 && m.nCompressed == 0)
    assert(m.trailingBytes == (4 + 4 + 30 - 3).toLong)
  }
}
