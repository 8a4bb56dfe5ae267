package graft.operators

import graft.SparkSpec

/** [[NalCensus]] — the Annex-B walker behind q318. */
class NalCensusSpec extends SparkSpec {

  private val plan = Seq((7, 25, true), (8, 18, true), (6, 30, false),
    (5, 60, true), (1, 40, false), (1, 44, false))

  test("round-trip: census matches the plan") {
    val m = NalCensus.parse(NalCensus.encodeSynthetic(plan))
    assert(m.nNals == 6 && m.nIdr == 1 && m.nSlice == 2 && m.nSps == 1 &&
      m.nPps == 1 && m.nSei == 1 && m.nOther == 0)
    assert(m.n4ByteStarts == 3)
    assert(m.sumNalBytes == plan.map(_._2 + 1).sum.toLong)
    assert(m.trailingBytes == 0)
  }

  test("leading garbage: nothing parses, everything trailing") {
    val bytes = Array[Byte](9, 9, 9) ++ NalCensus.encodeSynthetic(plan)
    val m = NalCensus.parse(bytes)
    assert(m.nNals == 0 && m.trailingBytes == bytes.length)
  }

  test("forbidden-zero bit stops the walk at that start code") {
    val good = NalCensus.encodeSynthetic(plan.take(2))
    val bad = Array[Byte](0, 0, 1, 0x85.toByte, 10, 11, 12) // forbidden bit set
    val m = NalCensus.parse(good ++ bad)
    assert(m.nNals == 2 && m.trailingBytes == 7)
  }

  test("final NAL ends at EOF (no closing start code needed)") {
    val m = NalCensus.parse(NalCensus.encodeSynthetic(Seq((7, 25, true), (1, 33, false))))
    assert(m.nNals == 2 && m.sumNalBytes == 25 + 33 + 2)
  }

  test("trailing zeros at EOF fold into the last NAL (trailing_zero_8bits)") {
    val bytes = NalCensus.encodeSynthetic(Seq((7, 10, false))) ++ Array[Byte](0, 0)
    val m = NalCensus.parse(bytes)
    // 00 00 at EOF cannot begin a start code that fits — the scan ends
    // the NAL at EOF, absorbing them (the spec's trailing_zero_8bits)
    assert(m.nNals == 1 && m.trailingBytes == 0 && m.sumNalBytes == 11 + 2)
  }

  test("empty stream is safe") {
    val m = NalCensus.parse(Array.emptyByteArray)
    assert(m.nNals == 0 && m.trailingBytes == 0)
  }

  // ------------------------------------------------------ SPS/PPS parse

  test("SPS round-trip: dims, profile/level, baseline vs high profile") {
    val s = NalCensus.parseSps(NalCensus.encodeSps(66, 41, 119, 67, frameMbsOnly = true))
    assert(s.ok == 1 && s.gated == 0)
    assert(s.profile == 66 && s.level == 41)
    assert(s.width == 120 * 16 && s.height == 68 * 16, s.toString)
    assert(s.chroma == 1 && s.bitDepth == 8, "absent extension infers 4:2:0 / 8-bit")
    val h = NalCensus.parseSps(NalCensus.encodeSps(100, 51, 9, 7, frameMbsOnly = true))
    assert(h.ok == 1 && h.profile == 100 && h.width == 160 && h.height == 128)
  }

  test("SPS crop arithmetic: 4:2:0 crop units, field coding doubles the vertical unit") {
    // progressive: CropUnitX = 2, CropUnitY = 2
    val p = NalCensus.parseSps(NalCensus.encodeSps(66, 30, 119, 67,
      frameMbsOnly = true, crop = Some((0, 4, 0, 2))))
    assert(p.width == 120 * 16 - 8 && p.height == 68 * 16 - 4, p.toString)
    // interlaced (frame_mbs_only = 0): height doubles, CropUnitY = 4
    val i = NalCensus.parseSps(NalCensus.encodeSps(66, 30, 119, 33,
      frameMbsOnly = false, crop = Some((1, 1, 1, 1))))
    assert(i.frameMbsOnly == 0)
    assert(i.width == 120 * 16 - 4 && i.height == 2 * 34 * 16 - 8, i.toString)
  }

  test("scaling-matrix SPS is DECLINED (gated), truncation is malformed — never conflated") {
    val gated = NalCensus.parseSps(NalCensus.encodeSps(100, 40, 10, 10,
      frameMbsOnly = true, scalingGate = true))
    assert(gated.ok == 0 && gated.gated == 1)
    val full = NalCensus.encodeSps(100, 40, 10, 10, frameMbsOnly = true)
    (1 until full.length).foreach { cut =>
      val s = NalCensus.parseSps(full.take(cut))
      assert(s.gated == 0, s"cut $cut misread as the gated class")
      // a cut can still parse if only trailing bits were lost — but it
      // must never invent different dimensions
      if (s.ok == 1) assert(s.width == 11 * 16 && s.height == 11 * 16)
    }
  }

  test("emulation prevention: values forcing 00 00 runs survive the escape round-trip") {
    // huge pic_width ue values write 20+ zero bits; scan for one whose
    // alignment forces a raw 00 00 0x run (and so a planted 03 escape)
    val hit = (1 << 20 until (1 << 20) + 64).view
      .map(pw => pw -> NalCensus.encodeSps(66, 10, pw, 100, frameMbsOnly = true))
      .find { case (_, b) => NalCensus.rbspUnescape(b, 0, b.length).length < b.length }
    assert(hit.isDefined, "no alignment exercised an emulation-prevention byte")
    val (pw, sps) = hit.get
    val s = NalCensus.parseSps(NalCensus.rbspUnescape(sps, 0, sps.length))
    assert(s.ok == 1 && s.width == (pw + 1) * 16 && s.height == 101 * 16,
      s"$s after the escape round-trip")
  }

  test("PPS entropy mode: CAVLC vs CABAC") {
    assert(NalCensus.parsePps(NalCensus.encodePps(cabac = false)) == ((1, 0)))
    assert(NalCensus.parsePps(NalCensus.encodePps(cabac = true)) == ((1, 1)))
    assert(NalCensus.parsePps(Array.emptyByteArray) == ((0, 0)))
  }

  test("spsFeatures finds the FIRST SPS/PPS in an Annex-B stream") {
    // exercised end-to-end by q403's oracle; here the in-stream lookup:
    val filler = Array.tabulate(9)(i => (i + 1).toByte)
    val stream = NalCensus.encodeNals(Seq(
      (6, filler),
      (7, NalCensus.encodeSps(100, 31, 79, 44, frameMbsOnly = true)),
      (8, NalCensus.encodePps(cabac = true)),
      (7, NalCensus.encodeSps(66, 10, 9, 9, frameMbsOnly = true)), // later SPS ignored
      (5, filler)))
    import spark.implicits._
    val row = NalCensus.spsFeatures(
      Seq((1L, stream)).toDF("id", "payload"), "id", "payload").collect()(0)
    assert(row.getAs[Long]("width") == 80 * 16 && row.getAs[Long]("height") == 45 * 16)
    assert(row.getAs[Long]("profile_idc") == 100 && row.getAs[Long]("cabac") == 1)
    assert(row.getAs[Long]("n_nals") == 5)
  }

  test("Exp-Golomb value past Int range is MALFORMED, never a wrapped negative") {
    // profile/constraints/level header, then ue() with 31 leading
    // zeros: (1 << 31) - 1 + u(31) would wrap negative — the reader
    // must fail closed (sps_ok = 0), not hand downstream guards a
    // negative-derived field with ok = 1
    val rbsp = Array[Int](66, 0, 30,
      0x00, 0x00, 0x00, 0x01, // 31 zero bits, then the marker 1
      0xff, 0xff, 0xff, 0xfe // 31 info bits (all ones) + pad
    ).map(_.toByte)
    val s = NalCensus.parseSps(rbsp)
    assert(s.ok == 0 && s.gated == 0, s.toString)
    // 30 zeros is still in range and must parse as a VALUE (the guard
    // sits exactly at the overflow boundary, not before it)
    val w = new java.io.ByteArrayOutputStream()
    w.write(66); w.write(0); w.write(30)
    // 30 zeros + 1 + 30 zero info bits = ue((1<<30)-1), then pad ones
    w.write(Array[Int](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00, 0x3f)
      .map(_.toByte))
    val s30 = NalCensus.parseSps(w.toByteArray)
    // the huge sps_id then fails a later read or a guard — either way
    // the parse NEVER reports a negative-derived dimension as ok
    assert(s30.ok == 0 || (s30.width >= 0 && s30.height >= 0), s30.toString)
  }
}
