package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Zstd sequences decoder vs REALITY: four frames produced by the
  * actual zstd CLI (level 1, single thread) are pinned byte-for-byte
  * and must decode to their exact original content AND verify against
  * the frame's own XXH64 checksum — the decoder is graded by the
  * reference implementation's output, not by a round-trip with our
  * own encoder. Plus the FSE table-build invariants and one test per
  * malformed/unsupported class.
  */
class ZstdSeqSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // zstd -1 --single-thread output, generated once and pinned.
  // Shapes: z1 = one sequence (raw literals + predefined FSE modes);
  // z3 = offset-1 overlap run (RLE idiom); z4 = multi-sequence with
  // new offsets; z5 = repeat-offset reuse across two sequences.
  private val fixtures = Seq(
    ("z1", "28b52ffd24279500006061626364656667685f78797a01000ccb117b17232f",
      "abcdefgh_abcdefgh_abcdefgh_abcdefgh_xyz"),
    ("z3", "28b52ffd243045000010616101009b000b4d5247b5",
      "a" * 48),
    ("z4", "28b52ffd2482350100a86f6e652074776f20746872656520666f7572666976050026c28195079c82874d9a08792a01e90e1394",
      "one two three one two three four one two three four five one two " * 2),
    ("z5", "28b52ffd2459bd0100e402000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f68656c6c6f20776f726c64656e64020020d10e589e7a1353e0",
      new String((0 until 32).map(_.toByte).toArray ++
        "hello hello hello hello hello world world world world end".getBytes("ISO-8859-1"), "ISO-8859-1")))

  test("real zstd frames decode byte-exactly and self-verify via XXH64") {
    fixtures.foreach { case (name, hx, want) =>
      val frame = hex(hx)
      val c = ZstdSeq.frameSeqCensus(frame)
      assert(c.valid == 1, s"$name: frame walk")
      assert(c.nCompressed == 1 && c.nDecoded == 1 && c.nFailed == 0 &&
        c.nUnsupported == 0, s"$name: $c")
      assert(c.decodedBytes == want.length.toLong, s"$name: length")
      assert(c.contentOk == 1,
        s"$name: decoded stream must match the frame's OWN checksum")
      // and the content itself, via the block decoder directly
      // (frame layout here: magic 4 + FHD 1 + FCS 1 + header 3)
      val dec = ZstdSeq.decodeBlock(frame, 9, frame.length - 4, 1 << 20).get
      assert(new String(dec, "ISO-8859-1") == want, s"$name: content")
    }
  }

  test("FSE table build: cell counts equal normalized counts, spread closes") {
    for ((norm, log) <- Seq((ZstdSeq.LLDefaultNorm, 6),
        (ZstdSeq.MLDefaultNorm, 6), (ZstdSeq.OFDefaultNorm, 5))) {
      val t = ZstdSeq.buildFse(norm, log)
      val size = 1 << log
      assert(t.symbol.length == size)
      // every symbol occupies exactly max(count, 1-if-lowprob) cells
      val occ = t.symbol.groupBy(identity).view.mapValues(_.length).toMap
      norm.zipWithIndex.foreach { case (c, s) =>
        val want = if (c == -1) 1 else c
        assert(occ.getOrElse(s, 0) == want, s"symbol $s: ${occ.getOrElse(s, 0)} != $want")
      }
      // state transitions stay inside the table
      (0 until size).foreach { u =>
        assert(t.numBits(u) >= 0 && t.numBits(u) <= log)
        val lo = t.baseline(u)
        val hi = lo + (1 << t.numBits(u)) - 1
        assert(lo >= 0 && hi < size, s"cell $u: [$lo,$hi] outside")
      }
      // low-probability cells reload the FULL accuracyLog bits
      norm.zipWithIndex.filter(_._1 == -1).foreach { case (_, s) =>
        val cell = (0 until size).find(t.symbol(_) == s).get
        assert(t.numBits(cell) == log && t.baseline(cell) == 0)
      }
    }
  }

  test("declared-unsupported vs malformed are reported separately") {
    // Huffman literals: unsupported (stub boundary), never failed
    val huff = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(2, 50, 10) ++ Array.fill(10)(7.toByte))))
    val ch = ZstdSeq.frameSeqCensus(huff)
    assert(ch.nUnsupported == 1 && ch.nFailed == 0)
    // FSE_Compressed sequence mode: also unsupported
    val fseMode = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(0, 4) ++ "abcd".getBytes ++
        Array[Byte](1, (2 << 6 | 2 << 4 | 2 << 2).toByte, 0x03))))
    val cf = ZstdSeq.frameSeqCensus(fseMode)
    assert(cf.nUnsupported == 1 && cf.nFailed == 0)
    // zeroed bitstream (no end marker): MALFORMED, not unsupported
    val z1Block = hex("6061626364656667685f78797a01000ccb11")
    val broken = z1Block.clone()
    broken(broken.length - 1) = 0
    val cb = ZstdSeq.frameSeqCensus(ZstdOps.encodeFrameWithBlocks(Seq((2, broken))))
    assert(cb.nFailed == 1 && cb.nUnsupported == 0)
  }

  test("adversarial streams fail closed: truncation, reserved bits, offset beyond output") {
    val z1Block = hex("6061626364656667685f78797a01000ccb11")
    // every truncation point of a known-good block decodes to None or
    // never to WRONG content
    (1 until z1Block.length).foreach { cut =>
      val r = ZstdSeq.decodeBlock(z1Block, 0, cut, 1 << 20)
      assert(r.isEmpty || new String(r.get, "ISO-8859-1").startsWith("abcdefgh_"),
        s"cut at $cut produced garbage")
    }
    // reserved mode bits set -> None
    val badModes = ZstdOps.literalsHeader(0, 2) ++ "ab".getBytes ++
      Array[Byte](1, 0x03, 0x03)
    assert(ZstdSeq.decodeBlock(badModes, 0, badModes.length, 1 << 20).isEmpty)
    // RLE-mode sequence demanding an offset beyond decoded output
    val farOff = ZstdOps.literalsHeader(0, 2) ++ "ab".getBytes ++
      Array[Byte](1, 0x54, 2, 12, 5, 0x02) // ofCode 12 -> offset ~4096
    assert(ZstdSeq.decodeBlock(farOff, 0, farOff.length, 1 << 20).isEmpty)
    // corrupted checksum reads content_ok = 0, not a crash
    val frame = hex(fixtures(0)._2).clone()
    frame(frame.length - 1) = (frame(frame.length - 1) ^ 0x11).toByte
    assert(ZstdSeq.frameSeqCensus(frame).contentOk == 0)
  }

  test("RLE-mode sequences block decodes (hand-encoded, closed form)") {
    // literals "0123456789", one sequence: ll=4 (code 4), ofCode=1
    // with extra bit 0 -> offsetValue 2 -> initial rep2 = 4; ml=8
    // (code 5). Output: 0123 + overlap-copy 8 @ offset 4 + 456789.
    val blk = ZstdOps.literalsHeader(0, 10) ++ "0123456789".getBytes ++
      Array[Byte](1, 0x54, 4, 1, 5, 0x02)
    val dec = ZstdSeq.decodeBlock(blk, 0, blk.length, 1 << 20)
    assert(dec.isDefined, "RLE-mode block must decode")
    assert(new String(dec.get, "ISO-8859-1") == "012301230123456789")
  }
}
