package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 frame walk + raw-block decoder — round-trips (incl. overlap
  * matches and the 255-run length extensions), the XXH32 known-answer
  * pin, and one test per malformed/corruption class (house rule).
  */
class Lz4OpsSpec extends AnyFunSuite {

  import Lz4Ops._

  test("XXH32 known answers pin the published algorithm") {
    // reference vectors from the published xxHash spec/impl behavior:
    // empty input with seed 0, and a one-byte input, computed once and
    // pinned (the frame's HC byte then cross-checks against real lz4
    // framing in the round-trip tests — a wrong constant fails there)
    assert(xxh32(Array.emptyByteArray, 0, 0) == 0x02CC5D05)
    assert(xxh32(Array[Byte](0), 0, 1) == 0xCF65B03E)
    assert(xxh32("a".getBytes("US-ASCII"), 0, 1) == 0x550D7456)
    assert(xxh32(Array.tabulate(32)(_.toByte), 0, 32) == 0x830741C1)
    // 16+ bytes exercises the 4-lane stripe loop
    val b = Array.tabulate(32)(i => i.toByte)
    assert(xxh32(b, 0, 32) != xxh32(b, 0, 31)) // length-sensitive
    assert(xxh32(b, 0, 16, seed = 1) != xxh32(b, 0, 16)) // seed-sensitive
  }

  test("raw block round-trip: literals + overlapping match + length extensions") {
    val lit1 = "abcdefgh".getBytes
    val tail = "xyz".getBytes
    val blk = encodeBlock(Seq((lit1, Some((4, 10))), (tail, None)))
    val r = decodeBlock(blk, 0, blk.length, 1 << 16)
    assert(r.ok == 1 && r.nSequences == 2)
    // match: offset 4, len 10 over "abcdefgh" -> copies efghefghef
    assert(new String(r.out) == "abcdefgh" + "efghefghef" + "xyz")
    // >= 15 literal and match lengths take the 255-run extension path
    val big = Array.tabulate(300)(i => ((i * 7) & 0xff).toByte)
    val blk2 = encodeBlock(Seq((big, Some((1, 100))), (tail, None)))
    val r2 = decodeBlock(blk2, 0, blk2.length, 1 << 16)
    assert(r2.ok == 1 && r2.decoded == 300L + 100 + 3)
    assert((300 until 400).forall(i => r2.out(i) == big(299))) // RLE from offset 1
  }

  test("raw block adversarial classes fail closed, no partial output") {
    val good = encodeBlock(Seq(("abcdefgh".getBytes, Some((4, 10))), ("xy".getBytes, None)))
    // every truncation point fails (mid-literal, mid-offset, lost tail)
    for (cut <- 1 until good.length) {
      val m = decodeBlock(good, 0, good.length - cut, 1 << 16)
      assert(m.ok == 0 && m.out == null, s"cut=$cut")
    }
    // zero offset and offset beyond the cursor
    val zeroOff = Array[Byte]((2 << 4).toByte, 'a', 'b', 0, 0, 0)
    assert(decodeBlock(zeroOff, 0, zeroOff.length, 1 << 16).ok == 0)
    val farOff = Array[Byte]((2 << 4).toByte, 'a', 'b', 100, 0, 0)
    assert(decodeBlock(farOff, 0, farOff.length, 1 << 16).ok == 0)
    // length bomb: 255-run literal extension declaring ~400 KB against
    // a 64 KB cap fails BEFORE any allocation of that size
    val bomb = Array.fill(1600)(0xFF.toByte)
    bomb(0) = 0xF0.toByte // token: literal run with extension
    assert(decodeBlock(bomb, 0, bomb.length, 1 << 16).ok == 0)
    // terminal literals with a nonzero match nibble = truncated match
    val nonzero = Array[Byte](((2 << 4) | 5).toByte, 'a', 'b')
    assert(decodeBlock(nonzero, 0, nonzero.length, 1 << 16).ok == 0)
  }

  test("frame round-trip: blocks, checksums, declared size all verify") {
    val blk = encodeBlock(Seq(("hello world ".getBytes, Some((6, 10))), ("!".getBytes, None)))
    val content = decodeBlock(blk, 0, blk.length, 1 << 16).out
    val stored = "stored bytes".getBytes
    val frame = encodeFrame(Seq(Left(blk), Right(stored)),
      blockChecksum = true,
      contentBytes = Some(content ++ stored),
      declaredSize = Some((content.length + stored.length).toLong))
    val m = parse(frame)
    assert(m.valid == 1 && m.trailingBytes == 0)
    assert(m.nCompressed == 1 && m.nStored == 1)
    assert(m.decodedBytes == content.length.toLong + stored.length)
    assert(m.nDecodeFailed == 0)
    assert(m.blockCrcOk == 2 && m.blockCrcBad == 0)
    assert(m.contentCrcOk == 1 && m.contentSizeMatch == 1)
  }

  test("header-checksum flip rejects the file whole (descriptor desync)") {
    val blk = encodeBlock(Seq(("abcd".getBytes, None)))
    val frame = encodeFrame(Seq(Left(blk)))
    frame(6) = (frame(6) ^ 0x11).toByte // HC byte (no content size)
    val m = parse(frame)
    assert(m.valid == 0 && m.trailingBytes == frame.length.toLong)
    // wrong magic and wrong version likewise
    val magic = encodeFrame(Seq(Left(blk))); magic(0) = 0x00
    assert(parse(magic).valid == 0)
  }

  test("corruption vs malformation: flipped literal decodes, checksums refuse") {
    val blk = encodeBlock(Seq(("abcdefgh".getBytes, Some((4, 8))), ("tt".getBytes, None)))
    val content = decodeBlock(blk, 0, blk.length, 1 << 16).out
    val frame = encodeFrame(Seq(Left(blk)), blockChecksum = true,
      contentBytes = Some(content), declaredSize = Some(content.length.toLong))
    frame(7 + 8 + 4 + 1) = (frame(7 + 8 + 4 + 1) ^ 0x5A).toByte // first literal
    val m = parse(frame)
    assert(m.valid == 1 && m.nDecodeFailed == 0, "corruption is not malformation")
    assert(m.blockCrcBad == 1 && m.blockCrcOk == 0)
    assert(m.contentCrcOk == 0 && m.contentSizeMatch == 1) // same length, wrong bytes
  }

  test("a block truncated under its declared size fails decode, counted not halted") {
    val blk = encodeBlock(Seq(("abcdefgh".getBytes, Some((4, 8))), ("tt".getBytes, None)))
    val cut = blk.dropRight(1)
    val frame = encodeFrame(Seq(Left(cut), Left(blk)))
    val m = parse(frame)
    assert(m.valid == 1, "framing stays authoritative")
    assert(m.nCompressed == 2 && m.nDecodeFailed == 1)
    assert(m.decodedBytes == 18L) // only the intact block's content
  }

  test("oversize declared block halts at that block, prefix kept") {
    val blk = encodeBlock(Seq(("abcd".getBytes, None)))
    val good = encodeFrame(Seq(Left(blk)))
    // splice a block declaring 100 bytes with only the EndMark behind it
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, good.length - 4 - (4 + blk.length)) // up to first block
    out.write(Array[Byte](100, 0, 0, 0))
    out.write(Array[Byte](1, 2, 3))
    val m = parse(out.toByteArray)
    assert(m.valid == 0 && m.nCompressed == 0)
    assert(m.trailingBytes == 7L) // the lying header + 3 bytes behind it
    // a size over the descriptor's block-max halts too, even if the
    // buffer could hold it
    val big = new java.io.ByteArrayOutputStream()
    big.write(good, 0, good.length - 4 - (4 + blk.length))
    big.write(Array[Byte](1, 0, 1, 0)) // 65537 > 64 KB block max
    big.write(new Array[Byte](70000))
    assert(parse(big.toByteArray).valid == 0)
  }

  test("incremental XXH32 equals the one-shot across arbitrary split points") {
    val data = Array.tabulate(1000)(i => ((i * 131) ^ (i >> 3)).toByte)
    val want = xxh32(data, 0, data.length)
    // splits chosen to land mid-stripe, on stripe boundaries, and in
    // the sub-4-byte tail path
    for (splits <- Seq(Seq(0, 1000), Seq(0, 1, 2, 3, 1000), Seq(0, 16, 32, 1000),
        Seq(0, 15, 17, 500, 999, 1000), Seq(0, 7, 23, 100, 1000))) {
      val st = new Xxh32Stream(0)
      splits.sliding(2).foreach { case Seq(a, b) => st.update(data, a, b - a) }
      assert(st.digest() == want, s"split $splits diverged from one-shot")
    }
    // short-input path (< 16 bytes total, no stripe ever runs)
    val st2 = new Xxh32Stream(0)
    st2.update(data, 0, 5); st2.update(data, 5, 6)
    assert(st2.digest() == xxh32(data, 0, 11))
    val st3 = new Xxh32Stream(0)
    assert(st3.digest() == xxh32(Array.emptyByteArray, 0, 0))
  }

  test("linked-block frame: a match across the block boundary decodes via history") {
    // block 1 emits 12 literal bytes; block 2's FIRST sequence matches
    // 8 of them at offset 12 — legal only with the linked 64KB window
    val lit = "abcdefghijkl".getBytes
    val blk1 = encodeBlock(Seq((lit, None)))
    val blk2 = encodeBlock(Seq((Array.emptyByteArray, Some((12, 8))), ("z".getBytes, None)))
    val content = lit ++ lit.take(8) ++ "z".getBytes
    val linkedFrame = encodeFrame(Seq(Left(blk1), Left(blk2)),
      contentBytes = Some(content), declaredSize = Some(content.length.toLong),
      blockIndep = false)
    val m = parse(linkedFrame)
    assert(m.valid == 1 && m.blockIndep == 0)
    assert(m.nDecodeFailed == 0, "cross-boundary match must decode, not count as failed")
    assert(m.decodedBytes == content.length.toLong)
    assert(m.contentCrcOk == 1 && m.contentSizeMatch == 1)
    // the SAME frame declared block-independent fails block 2 honestly
    // (its offset reaches before the block start)
    val indepFrame = encodeFrame(Seq(Left(blk1), Left(blk2)), blockIndep = true)
    val mi = parse(indepFrame)
    assert(mi.valid == 1 && mi.nDecodeFailed == 1)
  }

  test("linked-block frame: blocks after a failed decode are skipped, not failed") {
    val blk1 = encodeBlock(Seq(("abcdefgh".getBytes, Some((4, 8))), ("tt".getBytes, None)))
    val cut = blk1.dropRight(1) // genuine decode failure
    val blk2 = encodeBlock(Seq(("wxyz".getBytes, None)))
    val m = parse(encodeFrame(Seq(Left(cut), Left(blk2)), blockIndep = false))
    assert(m.valid == 1, "framing stays authoritative")
    assert(m.nCompressed == 2)
    assert(m.nDecodeFailed == 1,
      "block 2 is undecodable by construction (window lost), not a spurious failure")
    assert(m.decodedBytes == 0L)
    assert(m.contentSizeMatch == -1 || m.contentSizeMatch == 0)
  }
}
