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

  private val H13Hex: String =
    "28b52ffd64b80a353700fa6ec0133b406bd31cc3307c57fe295986af638cc7cbe27f2f77966ccff4ee66b27793a96bca60d1" +
    "e0c7f04b3fe223fe779e775d776c2339630d103b3a4df002260125013701149f339f849c332be1b4d0e075a17f2dbbc7b34e" +
    "67fd66a41e1db9b5eacc58c9f5560a5fa678070347888397ad091f7c455d53621dacf35a589d756557ddc85d9d59db324678" +
    "16b94e6af53d9313525d3b3a575ed345206c75e5ec2b5ffb8e13dfd61b98795b6c5f84d77426c1c8881a9cd390e38a944f28" +
    "269d0badec07b197953d3914e18c239a3c03a372a1f18b0c8a431122b7af3bf376926384bda997fd15330d8af0ee5a5d7b6d" +
    "5312fe424884e4b1a68398aeea42ea79222cbdb78a54789ee448c9b6e6a500c9ccdb861746383165774a426bdbcd4adb9fe4" +
    "776a5f17ded57d752107d21252b26f1dbc9dc8922f91e2050b01d19563ca10549dd29901021005ce915d14796fe065d9a273" +
    "5ab627b94e8720104d656a5bc2d814d20ebefc3aae983980ad71d77411590654962f24bc5c422245e6d81a5224c2ccacf4d6" +
    "326d2de7997df07da66974deb3dbb65112d66bcf22acc6cd385949050349dd9a14b9846c5d9a56539c492c8c9c19239fd92b" +
    "e1a44ff6a5da9c869b473a931ee91112a4d0ab3ca7caf2bbe5b271f101af60a06336362ea2c6632592a51957a44891dbda67" +
    "b671b83ee21f97ae9881b819ae94f40f486bed03f2717b655f3927ff7853ac718cf9070472afd961cb0100804020e484f772" +
    "edd1b7fc24d3777c72767a7ae5cc3bb2b32d2968fb41eabc5c9bce4d77745ce7272834eea238db7bd17bcdcb7e71527f7d2f" +
    "b4ace920f3fec5ae7e5dd73add3564f870cb83e80c37f7e8bfa6f68a1472eba45d1f39403bd9b5335d7b53db3209bd5ebf5f" +
    "5b61a6d16ecdd99d1b4821ccf665aa2b151729728b0a4c83cb9f4cab7d25fc820a8bc69f4f54285ee180cea0011c8e8d4387" +
    "1320a000c282026ad0a5f2e79709e61c5084b38c4a536c553097898752b1782c3030ae1f7c6ddd0255685c42a2219dc50a21" +
    "5af7c2e342d83ba7591f8b0684c772d9b88010334d5775f6950a06da4e64095d8fde9022afb466fefc414a72fc13f9ba703d" +
    "fa46f1af6bbf3a1b86e7f5f36c26c34299d92c73348ea7a613b22daaed23610566e212928b03c96d350d9dd3e2012da4c837" +
    "a2cb59b3d9e0a1ce89338ae9acf4b1278e671ac91a4d3166baa639c3445174165126ce2693da37b2a5f315e54a5d68c1e8f6" +
    "6dbbddb9b649381b60309d0b2b4768c1488afcc277f15f47fa5a464e772640e78cedf5b52ddb75ecd1671791e52d39d2dab4" +
    "537dc0dbd599697daf3a1d03037a4b68a7a3708e1bfcb905a33fb7371dd6721dd7b59daf23e2f7f2e42f806ceabdb1b62bf5" +
    "684b4968c1fba66ad35737f2665a5d5be5960cdac5a045dc5ef4c96ef3b627bb5eae72b7ade47a29ea8ad48295bd95b8b52d" +
    "bdee006335125a09eefadbd785caf47938a28984b4b5abd7b4948495e5eaaf37b0f66b089ed5988452d9baec235bd0f57bb2" +
    "693f099ba69b03699f51124aeee8ee606deb9250767c848d2d6b6b5e594e789dbc32d274dda853f9c96b4e6f1d3aeb95fdd7" +
    "d3745ddb3a71569790bc6b27486702aec570468160617166ebb4b2373ac3d1d9abd3b50665e32cdaa0801e0398cb19a522a1" +
    "e2cc0261fc4082021017670730978742b94cb48ca87236812c94338aca38c354269c55be67130d28822632e7b525e4fbdace" +
    "e85a849ca1ec3e5973a210037509493fc831e1bba049e4372d78e31580d5a8f19c524c1923333222329316d2012002420842" +
    "64e90111e0ad543549b2ec675c0627cad5320365d423602dcd65933f10cf1088d422d88a5a81df3cad60498277580ab02322" +
    "24e1a96fddeda7eec7082a684230a57a0b033de42bb2cb6d993501c3f0414f16d4e6af854463113b1ad30dfe911a9ab8c648" +
    "e02ede62e30e93964e8944f6a806684c0bd90d935fabe902ab128aa59368c940db01e218632a6ccc9c302dd9b3765c9341ee" +
    "9eca84b913dd5c181561f0a207b141080c440b45d80741a0b9f3e360ba6d53415056a5a29a0f86a06a33ff4915cae328675b" +
    "736172d9a4f0e62ffc990d0a82eac54d0eac820eac74ca9a3ff3055dda424c026485606204f5fb76ef4895ca949e2ec8c29f" +
    "08c0808b45a76cbd28987169afc15289184a863a8e50635bc055435a78028ea2a18ff444485befdc30d4adc43e191c1d32d4" +
    "5d788a66dae89b72862d0f5fc939df9b84395d6ede1d1cf6aa0b1b12d290f939629c2067342452f6859773f868801d091861" +
    "15405c0ed8bf5fa562a37d99a5f4fe2127cc53576d736ea0d8bb9aaad37b986f3e1b5199a7addfc8a8e48964978a38fcd40f" +
    "bde554b9bb8c2d0e3c0f0acb3e172103266b2c767724281c63a49901b1cef3a867b107b817fe47ab4e3cd587b9e5f2bd6afd" +
    "6915ec57d6d094d05a35e8de53552852ed5f1efce113755b0b159766aabd"

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

  test("real FSE_Compressed-mode frames decode: table descriptions read from the stream") {
    // zstd -3 and -19 on an 800-byte synthetic pattern: -3 emits
    // FSE_Compressed LL+OF with RLE ML, -19 all three FSE_Compressed —
    // the in-stream table-description path, graded against the
    // reference implementation's own output + checksum
    val want = Array.tabulate(800)(i => ((i * 7 + (i >> 3)) % 97 + 30).toByte)
    val frames = Seq(
      ("h3-3", "28b52ffd642002fd040004081e252c333a41484f575e656c737a20272f363d444b525960686f767d232a313840474e555c636a71791f262d343b424951585f666d747b212930373e454c535a626970777e242b32565d646b2e353c43676e757c3f464d54781e252c50575e65282f363d61686f763940474e72791f264a51585f222930375b6269704b52596080a8a4b147f7ff0df0750e01feffffff9976d7cc9c99999930450e59054fc58c60"),
      ("h3-19", "28b52ffd6420022d0500d4071e252c333a41484f575e656c737a20272f363d444b525960686f767d232a313840474e555c636a71791f262d343b424951585f666d747b212930373e454c535a626970777e242b32565d646b2e353c43676e757c3f464d54781e252c50575e65282f363d61686f763940474e72791f264a51585f222930375b6269701e80a4a8a12bb9ff6fe0751a0311e0ef7f070b93000000000082e6af9999993933518a1ccfae024fc58c60"))
    frames.foreach { case (name, hx) =>
      val frame = hex(hx)
      val c = ZstdSeq.frameSeqCensus(frame)
      assert(c.valid == 1 && c.nDecoded == 1 && c.nFailed == 0 && c.nUnsupported == 0,
        s"$name: $c")
      assert(c.decodedBytes == 800L, s"$name: length")
      assert(c.contentOk == 1, s"$name: XXH64 over the decoded stream")
      // content byte-exact via the block decoder (layout: magic 4 +
      // FHD 1 + 2-byte FCS + 3-byte block header)
      val dec = ZstdSeq.decodeBlock(frame, 10, frame.length - 4, 1 << 20).get
      assert(java.util.Arrays.equals(dec, want), s"$name: content mismatch")
    }
  }

  test("real Huffman-literals frames decode: 1-stream, FSE-compressed weights") {
    // zstd -3 on prose: Compressed literals, single stream, weights
    // FSE-compressed — the full tree-description path, graded against
    // the reference implementation's output + its own checksum
    val z2want = "the quick brown fox jumps over the lazy dog the quick brown fox " +
      "jumps again and again over the lazy dog until the quick brown fox is " +
      "tired of jumping over dogs"
    val z2 = hex("28b52ffd249fcd02000205111690a76d888822ddd064bb9184" +
      "9656be7177777172871c09d750b3385d3ef67628f9294db2b6695db3b070ed8643" +
      "991fe1a31bec5371babcb0e34a58443c00c816fc0807060087184211beffcadb96" +
      "ec9e5230b866194ee1bd8d")
    val c2 = ZstdSeq.frameSeqCensus(z2)
    assert(c2.valid == 1 && c2.nDecoded == 1 && c2.nFailed == 0 &&
      c2.nUnsupported == 0, s"z2: $c2")
    assert(c2.decodedBytes == z2want.length.toLong && c2.contentOk == 1)
    val dec = ZstdSeq.decodeBlock(z2, 9, z2.length - 4, 1 << 20).get
    assert(new String(dec, "ISO-8859-1") == z2want, "z2 content")
    // a deterministic 1.5KB vocab text at levels 3 and 19 — rebuildable
    // content, so decode is compared byte-for-byte
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho")
    val h5want = (0 until 300).map(i => vocab((i * 31 + (i >> 2)) % 17)).mkString(" ")
    val h5frames = Seq(
      "28b52ffd64dd041d040092840e13b0a70d874912caeeb6b1c6db564c92c2642a02650ade3939887ff7e16e2e836955288d2d05544fb8a0bf4682bfe46f96cb19930475e90fb5071b00755ced0f1a33a127021bd2f0f33db436c063065b730148f06374840c07a20600ef4026e30ff83e0685cf05ab7600d38250ef01aa17a1cad40cd8e7a28bc588e23686ac9e56267a25",
      "28b52ffd64dd04d50300a2451011c0eb5e9514952b6492484a1a0030c239012b8decc8ae93ed7b4d49f2333ff2c6c88e1a54e8fc3db288fc3d80d08bd7f1d79cf0f7fc55f44a1f4d01537d82cc031400865ced0f7266d6cf1bcfe300280940c38fd1113232102501de0319c81f33ad0f24c013c0250e50bd10aa7c9f9b218a3318b27a0256267a25")
    h5frames.foreach { hx =>
      val f = hex(hx)
      val c = ZstdSeq.frameSeqCensus(f)
      assert(c.nDecoded == 1 && c.contentOk == 1 && c.decodedBytes == 1501L, c.toString)
      val d = ZstdSeq.decodeBlock(f, 10, f.length - 4, 1 << 20).get
      assert(new String(d, "ISO-8859-1") == h5want)
    }
  }

  test("real 4-stream Huffman frame decodes and self-verifies (1.8KB, zstd -3)") {
    // 3000 bytes of markdown at level 3: Compressed literals with the
    // 4-stream layout (jump table) — verified via the frame's OWN
    // XXH64 checksum over the decoded stream
    val f = hex(H13Hex)
    val c = ZstdSeq.frameSeqCensus(f)
    assert(c.valid == 1 && c.nDecoded == 1 && c.nFailed == 0 &&
      c.nUnsupported == 0, c.toString)
    assert(c.decodedBytes == 3000L)
    assert(c.contentOk == 1, "4-stream decode must match the frame checksum")
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

  test("defects vs lost-state skips are reported separately") {
    // treeless/Repeat as the FIRST block of a frame: spec-corrupt
    // (no prior table can exist) -> a DEFECT, not a stub
    val treelessFirst = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(3, 50, 10) ++ Array.fill(10)(7.toByte))))
    val ct = ZstdSeq.frameSeqCensus(treelessFirst)
    assert(ct.nFailed == 1 && ct.nUnsupported == 0)
    val repFirst = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(0, 4) ++ "abcd".getBytes ++
        Array[Byte](1, (3 << 6 | 3 << 4 | 3 << 2).toByte, 0x03))))
    val cr = ZstdSeq.frameSeqCensus(repFirst)
    assert(cr.nFailed == 1 && cr.nUnsupported == 0)
    // GARBAGE Huffman-compressed literals: defect (decode attempted)
    val badHuff = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(2, 50, 10) ++ Array.fill(10)(7.toByte))))
    val cg = ZstdSeq.frameSeqCensus(badHuff)
    assert(cg.nFailed == 1 && cg.nUnsupported == 0)
    // a garbage FSE table DESCRIPTION is a defect too
    val fseGarbage = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, ZstdOps.literalsHeader(0, 4) ++ "abcd".getBytes ++
        Array[Byte](1, (2 << 6 | 2 << 4 | 2 << 2).toByte, 0x03))))
    val cf = ZstdSeq.frameSeqCensus(fseGarbage)
    assert(cf.nFailed == 1 && cf.nUnsupported == 0)
    // but AFTER a failed block, a Repeat-mode block is undecodable by
    // construction (state lost) -> skipped honestly, not a defect
    val z1Blk = hex("6061626364656667685f78797a01000ccb11")
    val brokenFirst = z1Blk.clone(); brokenFirst(brokenFirst.length - 1) = 0
    val repAfterFail = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, brokenFirst),
      (2, ZstdOps.literalsHeader(0, 4) ++ "abcd".getBytes ++
        Array[Byte](1, (3 << 6 | 3 << 4 | 3 << 2).toByte, 0x03))))
    val ca = ZstdSeq.frameSeqCensus(repAfterFail)
    assert(ca.nFailed == 1 && ca.nUnsupported == 1, ca.toString)
    // zeroed bitstream (no end marker): MALFORMED, not unsupported
    val z1Block = hex("6061626364656667685f78797a01000ccb11")
    val broken = z1Block.clone()
    broken(broken.length - 1) = 0
    val cb = ZstdSeq.frameSeqCensus(ZstdOps.encodeFrameWithBlocks(Seq((2, broken))))
    assert(cb.nFailed == 1 && cb.nUnsupported == 0)
  }

  test("after a failed block EVERY remaining compressed block is state-lost; raw still counts") {
    val z1Blk = hex("6061626364656667685f78797a01000ccb11")
    val broken = z1Blk.clone(); broken(broken.length - 1) = 0
    // broken first, then a block that WOULD decode in isolation: it must
    // be skipped, not decoded — its repeat-offset history and window were
    // reset by the failure, so a "successful" decode could be silently
    // WRONG bytes (the z1 block's sequence uses a new offset here, but
    // the census cannot know that without trusting the broken state)
    val f = ZstdOps.encodeFrameWithBlocks(Seq(
      (2, broken), (2, z1Blk), (0, "tail".getBytes)))
    val c = ZstdSeq.frameSeqCensus(f)
    assert(c.nFailed == 1 && c.nUnsupported == 1 && c.nDecoded == 0, c.toString)
    // the raw block is self-contained and still counts
    assert(c.decodedBytes == 4L && c.valid == 1, c.toString)
  }

  test("dictionary-id frames are a DECLINED class, not invalid: walked, gated, counted") {
    val z1Blk = hex("6061626364656667685f78797a01000ccb11")
    val raw = (0, "plainbytes".getBytes)
    val plain = ZstdOps.encodeFrameWithBlocks(Seq(raw, (2, z1Blk)))
    val gated = ZstdOps.encodeFrameWithBlocks(Seq(raw, (2, z1Blk)), dictId = 42)
    val cp = ZstdSeq.frameSeqCensus(plain)
    assert(cp.valid == 1 && cp.dictGated == 0 && cp.nDecoded == 1 &&
      cp.decodedBytes == 49L, cp.toString)
    val cg = ZstdSeq.frameSeqCensus(gated)
    // a VALID frame the decoder declines: block structure walked, the
    // compressed block counted unsupported (its entropy tables/window
    // may seed from dictionary content the walker does not have) —
    // never failed, never "decoded" with dictionary-blind state
    assert(cg.valid == 1 && cg.dictGated == 1, cg.toString)
    assert(cg.nBlocks == 2 && cg.nCompressed == 1, cg.toString)
    assert(cg.nDecoded == 0 && cg.nFailed == 0 && cg.nUnsupported == 1, cg.toString)
    assert(cg.decodedBytes == 10L, "raw content has no dictionary dependence")
    // truncation INSIDE the dict-id field is a spec violation: invalid
    assert(ZstdSeq.frameSeqCensus(gated.take(6)).valid == 0)
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

  test("cross-block state: Repeat modes, repeat-offset carry, window-crossing match") {
    // block 1: the known RLE-mode block (content 012301230123456789;
    // its sequence takes offsetValue=2 -> rep history becomes [4,1,8]).
    // block 2: modes all-Repeat (reuses the RLE pins), OF extra bit 1
    // -> offsetValue=3 -> rep3=8 -> a match reaching 4 bytes into
    // BLOCK 1's decoded output across the boundary.
    val b1 = ZstdOps.literalsHeader(0, 10) ++ "0123456789".getBytes ++
      Array[Byte](1, 0x54, 4, 1, 5, 0x02)
    val b2 = ZstdOps.literalsHeader(0, 8) ++ "abcdEFGH".getBytes ++
      Array[Byte](1, 0xFC.toByte, 0x03)
    val ctx = new ZstdSeq.FrameCtx()
    val d1 = ZstdSeq.decodeBlock(b1, 0, b1.length, 1 << 20, ctx)
    assert(d1.isDefined && new String(d1.get, "ISO-8859-1") == "012301230123456789")
    ctx.pushHist(d1.get, 0, d1.get.length)
    val d2 = ZstdSeq.decodeBlock(b2, 0, b2.length, 1 << 20, ctx)
    assert(d2.isDefined, "Repeat-mode block with carried state must decode")
    assert(new String(d2.get, "ISO-8859-1") == "abcd6789abcdEFGH",
      s"window-crossing match: ${new String(d2.get, "ISO-8859-1")}")
    // the same two blocks through the frame walker
    val c = ZstdSeq.frameSeqCensus(ZstdOps.encodeFrameWithBlocks(Seq((2, b1), (2, b2))))
    assert(c.nDecoded == 2 && c.nFailed == 0 && c.decodedBytes == 34L, c.toString)
    // standalone (no ctx), block 2 is spec-corrupt: Repeat with no prior
    assert(ZstdSeq.decodeBlock(b2, 0, b2.length, 1 << 20).isEmpty)
  }

  test("cross-block state: Treeless literals reuse the frame's Huffman table") {
    // carve z2's block apart: its Huffman tree feeds the frame table,
    // then a second block ships ONLY the stream (Treeless) + nbSeq=0
    val z2 = hex("28b52ffd249fcd02000205111690a76d888822ddd064bb9184" +
      "9656be7177777172871c09d750b3385d3ef67628f9294db2b6695db3b070ed8643" +
      "991fe1a31bec5371babcb0e34a58443c00c816fc0807060087184211beffcadb96" +
      "ec9e5230b866194ee1bd8d")
    val blk = z2.slice(9, z2.length - 4)
    val v = ((blk(0) & 0xff) | ((blk(1) & 0xff) << 8) | ((blk(2) & 0xff) << 16)) >>> 4
    val (regen, comp) = (v & 0x3FF, (v >> 10) & 0x3FF)
    val (_, treeBytes) = ZstdSeq.readHufTable(blk, 3, 3 + comp).get
    val stream = blk.slice(3 + treeBytes, 3 + comp)
    def hdr3(litType: Int, rg: Int, cp: Int): Array[Byte] = {
      val h = litType | (rg << 4) | (cp << 14) // size_format 00 -> 1 stream
      Array[Byte]((h & 0xff).toByte, ((h >> 8) & 0xff).toByte, ((h >> 16) & 0xff).toByte)
    }
    val treeless = hdr3(3, regen, stream.length) ++ stream ++ Array[Byte](0)
    val frame = ZstdOps.encodeFrameWithBlocks(Seq((2, blk), (2, treeless)))
    val c = ZstdSeq.frameSeqCensus(frame)
    assert(c.nDecoded == 2 && c.nFailed == 0 && c.nUnsupported == 0, c.toString)
    // block 1 regenerates the full 159-char text; the treeless twin
    // carries nbSeq = 0, so its content is exactly the 80 literals
    // decoded through the REUSED table
    assert(c.decodedBytes == 159L + regen, s"regen=$regen ${c.toString}")
  }

  test("pinned 400KB multi-block real frame (zstd -6): full decode, byte-exact") {
    // six 128KB-boundary blocks from the reference CLI — the shapes a
    // real shard exchange produces (Repeat modes, treeless literals,
    // window-crossing matches all live here); content rebuilt from its
    // deterministic formula, so the comparison is byte-exact end to end
    val frame = {
      val in = getClass.getResourceAsStream("/zstd_multiblock_400k.zst")
      try in.readAllBytes() finally in.close()
    }
    val want = Array.tabulate(400000) { i =>
      ((((i * 131 + (i >> 5) * 17) % 251) ^ (i >> 10)) & 0xff).toByte
    }
    val c = ZstdSeq.frameSeqCensus(frame, maxOut = 1 << 23)
    assert(c.valid == 1 && c.nBlocks == 6 && c.nDecoded == 6 &&
      c.nFailed == 0 && c.nUnsupported == 0, c.toString)
    assert(c.decodedBytes == 400000L)
    assert(c.contentOk == 1, "decoded stream vs the frame's own XXH64")
    // and the bytes themselves, through the ctx-threaded block decoder
    val ctx = new ZstdSeq.FrameCtx(1 << 23)
    var pos = 4 + 1 + 4 // magic + FHD(0xa4: checksum, 4-byte FCS) + FCS
    val out = new java.io.ByteArrayOutputStream()
    var last = false
    while (!last) {
      val h = (frame(pos) & 0xff) | ((frame(pos + 1) & 0xff) << 8) |
        ((frame(pos + 2) & 0xff) << 16)
      pos += 3
      last = (h & 1) != 0
      val size = h >>> 3
      val dec = ZstdSeq.decodeBlock(frame, pos, pos + size, 1 << 23, ctx).get
      ctx.pushHist(dec, 0, dec.length)
      out.write(dec, 0, dec.length)
      pos += size
    }
    assert(java.util.Arrays.equals(out.toByteArray, want),
      "multi-block content must be byte-exact")
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

  // ---- dictionary frames (round-15 item 6)

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/zdict/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("REAL trained dictionary parses: magic, id, entropy tables, reps, content") {
    val d = ZstdSeq.parseDictionary(resource("graft.dict"))
    assert(d.isDefined, "zstd --train output must parse")
    val dict = d.get
    assert(dict.dictId == 1231626331L)
    assert(dict.content.nonEmpty && dict.content.length < 2048)
    assert(dict.rep1 > 0 && dict.huf.maxBits >= 1)
    // a frame payload is NOT a dictionary
    assert(ZstdSeq.parseDictionary(resource("payload_d3.zst")).isEmpty)
  }

  test("REAL zstd -D frames decode against the supplied dictionary, checksum-verified") {
    val dict = ZstdSeq.parseDictionary(resource("graft.dict")).get
    val want = resource("payload.json")
    for (name <- Seq("payload_d3.zst", "payload_d19.zst")) {
      val frame = resource(name)
      // without the dictionary: the honest declined class, as before
      val gated = ZstdSeq.frameSeqCensus(frame)
      assert(gated.dictGated == 1 && gated.nDecoded == 0 && gated.dictUsed == 0,
        s"$name without dict: $gated")
      // with it: full decode, graded by the frame's own XXH64 checksum
      val c = ZstdSeq.frameSeqCensus(frame,
        dicts = Map(dict.dictId -> dict))
      assert(c.valid == 1 && c.dictGated == 0 && c.dictUsed == 1, s"$name: $c")
      assert(c.nFailed == 0 && c.nUnsupported == 0, s"$name: $c")
      assert(c.decodedBytes == want.length.toLong, s"$name: length $c")
      assert(c.contentOk == 1, s"$name: checksum over dict-seeded decode")
    }
    // the WRONG dictionary id supplied: frame stays declined
    val other = ZstdSeq.frameSeqCensus(resource("payload_d3.zst"),
      dicts = Map(7L -> dict))
    assert(other.dictGated == 1 && other.nDecoded == 0)
  }

  test("synthetic dictionary: parse round-trip and seeded decode reaching dict CONTENT") {
    val content = Array.tabulate(128)(i => ((i * 7 + 3) % 251).toByte)
    val dict = ZstdSeq.parseDictionary(ZstdSeq.encodeDictionary(42L, content)).get
    assert(dict.dictId == 42L && dict.content.toSeq == content.toSeq)
    assert(dict.rep1 == 1 && dict.rep2 == 4 && dict.rep3 == 8)
    // block: 2 raw literals + one sequence whose offset reaches 95
    // bytes INTO the dictionary window (offset 97 > block output)
    val blk = ZstdOps.literalsHeader(0, 2) ++ "XY".getBytes ++
      Array[Byte](1, 0x54, 2, 6, 5, 0x64)
    val ctx = ZstdSeq.seededCtx(dict, 1 << 20)
    val dec = ZstdSeq.decodeBlock(blk, 0, blk.length, 1 << 20, ctx)
    assert(dec.isDefined, "dict-window match must decode")
    val got = dec.get
    assert(got.length == 10)
    assert(new String(got.take(2), "ISO-8859-1") == "XY")
    // offset 97 from o=2 → dict content positions [128-95, 128-87)
    assert(got.drop(2).toSeq == content.slice(33, 41).toSeq,
      "match bytes must come from dictionary content")
    // and WITHOUT the dictionary the same block must fail (offset
    // beyond any window), never fabricate
    assert(ZstdSeq.decodeBlock(blk, 0, blk.length, 1 << 20).isEmpty)
  }

  test("treeless FIRST block is legal when the dictionary supplies the Huffman table") {
    val content = Array.tabulate(64)(i => (i % 7).toByte)
    val dict = ZstdSeq.parseDictionary(ZstdSeq.encodeDictionary(9L, content)).get
    // 4-stream treeless literals: 16 symbols of 1 bit via the dict's
    // 2-symbol table; jump table 1,1,1; streams 0x10|pattern
    val blk = ZstdOps.literalsHeader(3, 16, 10) ++
      Array[Byte](1, 0, 1, 0, 1, 0) ++
      Array[Byte](0x1a, 0x15, 0x10, 0x1f) ++ Array[Byte](0)
    val ctx = ZstdSeq.seededCtx(dict, 1 << 20)
    val dec = ZstdSeq.decodeBlock(blk, 0, blk.length, 1 << 20, ctx)
    assert(dec.isDefined, "treeless-with-dict-table must decode")
    assert(dec.get.length == 16)
    assert(dec.get.forall(b => b == 0 || b == 1),
      "symbols come from the dict's 2-symbol table")
    // without a dictionary this exact block is the spec-corrupt class
    assert(ZstdSeq.decodeBlock(blk, 0, blk.length, 1 << 20).isEmpty)
  }
}
