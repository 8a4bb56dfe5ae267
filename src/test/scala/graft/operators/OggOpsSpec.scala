package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** OggOps contract: round-trip, CRC verification (the anti-desync
  * guard), granule/duration arithmetic, and stop-don't-guess on every
  * malformed-page class.
  */
class OggOpsSpec extends AnyFunSuite {

  private def stream = OggOps.encodeSynthetic(Seq(
    (2, 0L, Seq(19)),            // BOS
    (0, 0L, Seq(45)),            // tags
    (0, 960L, Seq(100, 120)),    // data
    (1, 1920L, Seq(80)),         // continued data
    (4, 2880L, Seq(60))))        // EOS

  test("round-trip: pages, flags, payload/header mass, duration") {
    val m = OggOps.parse(stream)
    assert(m.nPages == 5 && m.nBos == 1 && m.nEos == 1 && m.nContinued == 1)
    assert(m.payloadBytes == 19 + 45 + 220 + 80 + 60)
    assert(m.headerBytes == 28 + 28 + 29 + 28 + 28)
    assert(m.lastGranule == 2880 && m.durationMs == 60)
    assert(m.trailingBytes == 0)
  }

  test("known-answer CRC: table is the unreflected 0x04C11DB7 one") {
    // Ogg CRC of the 4 bytes 'OggS' with zero init and no final xor —
    // computed independently (bitwise long-division)
    def ref(data: Array[Byte]): Int = {
      var r = 0L
      for (b <- data) {
        r ^= (b & 0xffL) << 24
        for (_ <- 0 until 8)
          r = if ((r & 0x80000000L) != 0) ((r << 1) ^ 0x04c11db7L) & 0xffffffffL
              else (r << 1) & 0xffffffffL
      }
      r.toInt
    }
    val data = "OggS".getBytes("US-ASCII")
    assert(OggOps.crc(data, 0, 4) == ref(data))
  }

  test("a flipped payload byte fails the CRC and stops the walk") {
    val bytes = stream.clone()
    val tagsStart = 27 + 1 + 19 // after BOS page
    bytes(tagsStart + 28 + 10) = (bytes(tagsStart + 28 + 10) ^ 0x40).toByte
    val m = OggOps.parse(bytes)
    assert(m.nPages == 1 && m.nBos == 1)
    assert(m.trailingBytes == bytes.length - tagsStart)
  }

  test("a flipped stored-CRC byte also stops the walk") {
    val bytes = stream.clone()
    bytes(22) = (bytes(22) ^ 0x01).toByte // BOS page's CRC field
    val m = OggOps.parse(bytes)
    assert(m.nPages == 0 && m.trailingBytes == bytes.length)
  }

  test("bad magic / bad version stop at that page") {
    val bad = stream.clone()
    bad(0) = 'X'
    assert(OggOps.parse(bad).nPages == 0)
    val badVer = stream.clone()
    badVer(4) = 1
    assert(OggOps.parse(badVer).nPages == 0)
  }

  test("truncation inside segment table or payload stops cleanly") {
    val m1 = OggOps.parse(stream.take(27)) // header only, no table
    assert(m1.nPages == 0 && m1.trailingBytes == 27)
    val m2 = OggOps.parse(stream.take(27 + 1 + 5)) // mid-payload
    assert(m2.nPages == 0 && m2.trailingBytes == 33)
  }

  test("granule -1 (no-packet-ends page) does not advance the duration") {
    val s = OggOps.encodeSynthetic(Seq(
      (2, 0L, Seq(10)),
      (0, 960L, Seq(20)),
      (0, -1L, Seq(30)),   // continuation page: granule = -1
      (4, 1920L, Seq(5))))
    val m = OggOps.parse(s)
    assert(m.lastGranule == 1920 && m.durationMs == 40)
    val cut = OggOps.parse(s.take(s.length - (27 + 1 + 5))) // drop EOS page
    assert(cut.lastGranule == 960) // the -1 page didn't clobber it
  }

  test("empty input parses to zero everything") {
    val m = OggOps.parse(Array.emptyByteArray)
    assert(m.nPages == 0 && m.trailingBytes == 0)
  }
}
