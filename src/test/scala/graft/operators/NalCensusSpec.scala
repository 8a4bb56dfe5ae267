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
}
