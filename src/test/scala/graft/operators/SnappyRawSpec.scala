package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Raw snappy decoder — round-trips (including the overlapping-copy
  * RLE idiom and every literal length form) plus one test per
  * adversarial class (house rule): bomb preamble, zero/too-far
  * offsets, truncations, and the exact-consumption invariants.
  */
class SnappyRawSpec extends AnyFunSuite {

  import SnappyRaw._

  private def roundTrip(ops: Seq[RawOp]): Array[Byte] = {
    val enc = encode(ops)
    val m = decode(enc, 0, enc.length)
    assert(m.ok == 1, s"decode failed on $ops")
    assert(m.decoded == m.declared)
    m.out
  }

  test("literal + copy round-trip, overlap reads just-written bytes (RLE)") {
    // "abcd" then copy(offset=2, len=6): cd cd cd — overlap twice over
    val out = roundTrip(Seq(Lit("abcd".getBytes), Copy(2, 6)))
    assert(new String(out) == "abcdcdcdcd")
    // offset=1, len=8 over a 1-byte literal: pure RLE
    val rle = roundTrip(Seq(Lit("x".getBytes), Copy(1, 8)))
    assert(new String(rle) == "x" * 9)
  }

  test("every literal length form: inline, 1-byte, 2-byte") {
    for (len <- Seq(1, 59, 60, 61, 100, 256, 257, 5000)) {
      val body = Array.tabulate(len)(i => ((i * 7 + 1) & 0xff).toByte)
      val out = roundTrip(Seq(Lit(body)))
      assert(java.util.Arrays.equals(out, body), s"len=$len")
    }
  }

  test("copy tag forms: 1-byte offset (4..11 near) and 2-byte offset") {
    // near copy hits the 2-byte (tag+1) form; far / long hit 3-byte
    val base = Array.tabulate(3000)(i => ((i * 13) & 0xff).toByte)
    val out = roundTrip(Seq(Lit(base), Copy(7, 5), Copy(2900, 64), Copy(40, 3)))
    assert(out.length == 3000 + 5 + 64 + 3)
    assert(out(3000) == base(3000 - 7) && out(3004) == base(2997))
    assert(out(3005) == out(3005 - 2900))
  }

  test("bomb preamble: declared length over the cap fails BEFORE allocating") {
    // varint 2^31-ish declared length on a 6-byte input
    val bomb = Array(0xFF, 0xFF, 0xFF, 0xFF, 0x07, 0x00).map(_.toByte)
    val m = decode(bomb, 0, bomb.length)
    assert(m.ok == 0 && m.decoded == 0L)
    // and an unterminated preamble varint fails, not spins
    val unterminated = Array.fill(6)(0x80.toByte)
    assert(decode(unterminated, 0, 6).ok == 0)
  }

  test("copy offset 0 and offset beyond the decoded cursor fail closed") {
    val good = encode(Seq(Lit("abcdef".getBytes), Copy(3, 4)))
    assert(decode(good, 0, good.length).ok == 1)
    // offset byte 0 in the 2-byte-offset form
    val zeroOff = encode(Seq(Lit("abcdef".getBytes))) ++
      Array((((4 - 1) << 2) | 2).toByte, 0.toByte, 0.toByte)
    assert(decode(zeroOff, 0, zeroOff.length).ok == 0)
    // offset 100 with only 6 bytes decoded
    val farOff = encode(Seq(Lit("abcdef".getBytes))) ++
      Array((((4 - 1) << 2) | 2).toByte, 100.toByte, 0.toByte)
    assert(decode(farOff, 0, farOff.length).ok == 0)
  }

  test("truncations and over/under-production fail closed, no partial output") {
    val full = encode(Seq(Lit("abcdefgh".getBytes), Copy(4, 6)))
    for (cut <- 1 until full.length) {
      val m = decode(full, 0, full.length - cut)
      assert(m.ok == 0 && m.out == null, s"cut=$cut")
    }
    // declared larger than produced (preamble says 20, stream makes 14)
    val short = full.clone(); short(0) = 20.toByte
    assert(decode(short, 0, short.length).ok == 0)
    // declared smaller: literal would overrun the output
    val long = full.clone(); long(0) = 10.toByte
    assert(decode(long, 0, long.length).ok == 0)
  }

  test("framing integration: compressedChunk round-trips, CRC flip and truncation counted") {
    val ops = Seq(Lit("hello world ".getBytes), Copy(6, 10))
    def framed(flip: Boolean, trunc: Boolean) = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(SnappyFrameOps.identifierChunk)
      out.write(SnappyFrameOps.compressedChunk(ops, flipCrc = flip, truncate = trunc))
      out.toByteArray
    }
    val ok = SnappyFrameOps.parse(framed(flip = false, trunc = false))
    assert(ok.valid == 1 && ok.rawOk == 1 && ok.rawBytes == 22L &&
      ok.rawCrcOk == 1 && ok.rawCrcBad == 0 && ok.nLiterals == 1 && ok.nCopies == 1)
    val flipped = SnappyFrameOps.parse(framed(flip = true, trunc = false))
    assert(flipped.rawOk == 1 && flipped.rawCrcBad == 1 && flipped.rawCrcOk == 0)
    val cut = SnappyFrameOps.parse(framed(flip = false, trunc = true))
    assert(cut.valid == 1, "framing stays authoritative") // counted, not halted
    assert(cut.rawFailed == 1 && cut.rawOk == 0 && cut.rawBytes == 0L)
  }

  test("encoder refuses an empty literal (would stamp the 4-byte-length tag)") {
    // (0-1)<<2 = 0xFC is the 4-byte-length literal tag — a silently
    // corrupt stream; every invalid encoder input must be guarded
    intercept[IllegalArgumentException] {
      SnappyRaw.encode(Seq(SnappyRaw.Lit(Array.emptyByteArray)))
    }
  }
}
