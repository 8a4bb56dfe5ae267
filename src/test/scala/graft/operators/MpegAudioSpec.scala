package graft.operators

import graft.SparkSpec

/** [[MpegAudio]] — the MP3 frame-header walker behind q314. Round-trip
  * against the synthesizer's plan, plus the adversarial inputs a
  * 100 TB crawl actually contains: truncation, free/invalid indices,
  * mid-stream sample-rate changes, lying ID3 sizes, garbage. The
  * walker's contract: count only complete valid frames, stop at the
  * first unparseable byte, report the remainder as trailing_bytes —
  * never guess.
  */
class MpegAudioSpec extends SparkSpec {

  private def mkFrames(n: Int, k: Int): Seq[(Int, Int)] =
    (0 until n).map(j => (1 + (k + j) % 14, (k + j) % 2))

  test("round-trip: parse recovers the synthetic frame plan exactly") {
    for (k <- 0 until 50) {
      val frames = mkFrames(5 + k % 9, k)
      val bytes = MpegAudio.encodeSynthetic(k % 200, k % 3, frames)
      val m = MpegAudio.parse(bytes)
      assert(m.id3Bytes == 10 + k % 200)
      assert(m.sampleRate == MpegAudio.SampleRateHz(k % 3))
      assert(m.nFrames == frames.length)
      assert(m.sumBitrateKbps == frames.map(f => MpegAudio.BitrateKbps(f._1).toLong).sum)
      assert(m.nDistinctBitrates == frames.map(_._1).distinct.length)
      assert(m.nPadded == frames.count(_._2 == 1))
      assert(m.durationUs ==
        frames.length.toLong * 1152 * 1000000L / MpegAudio.SampleRateHz(k % 3))
      assert(m.trailingBytes == 0)
    }
  }

  test("no ID3 prefix parses with id3Bytes = 0") {
    val bytes = MpegAudio.encodeSynthetic(-1, 0, mkFrames(4, 3))
    val m = MpegAudio.parse(bytes)
    assert(m.id3Bytes == 0 && m.nFrames == 4 && m.trailingBytes == 0)
  }

  test("truncated final frame: complete frames counted, remainder reported") {
    val full = MpegAudio.encodeSynthetic(20, 1, mkFrames(5, 2))
    val cut = full.dropRight(7)
    val m = MpegAudio.parse(cut)
    assert(m.nFrames == 4)
    val lastLen = 144000 * MpegAudio.BitrateKbps(mkFrames(5, 2).last._1) /
      MpegAudio.SampleRateHz(1) + mkFrames(5, 2).last._2
    assert(m.trailingBytes == lastLen - 7)
  }

  test("free bitrate (index 0) stops the walk — length is not computable") {
    val good = MpegAudio.encodeSynthetic(-1, 0, mkFrames(2, 0))
    val freeHdr = Array(0xff, 0xfb, (0 << 4) | (0 << 2), 0x00).map(_.toByte)
    val m = MpegAudio.parse(good ++ freeHdr ++ Array.fill(40)(0x55.toByte))
    assert(m.nFrames == 2 && m.trailingBytes == 44)
  }

  test("reserved sample-rate index (3) stops the walk") {
    val good = MpegAudio.encodeSynthetic(-1, 0, mkFrames(2, 0))
    val badHdr = Array(0xff, 0xfb, (5 << 4) | (3 << 2), 0x00).map(_.toByte)
    val m = MpegAudio.parse(good ++ badHdr)
    assert(m.nFrames == 2 && m.trailingBytes == 4)
  }

  test("mid-stream sample-rate change stops (no silent mixed-rate duration)") {
    val a = MpegAudio.encodeSynthetic(-1, 0, mkFrames(3, 1))
    val b = MpegAudio.encodeSynthetic(-1, 2, mkFrames(2, 1))
    val m = MpegAudio.parse(a ++ b)
    assert(m.nFrames == 3 && m.sampleRate == 44100)
    assert(m.trailingBytes == b.length)
  }

  test("garbage (no sync) yields zero frames, everything trailing") {
    val junk = Array.tabulate(64)(i => ((i * 37 + 5) % 256).toByte)
    val m = MpegAudio.parse(junk)
    assert(m.nFrames == 0 && m.sampleRate == 0 && m.durationUs == 0L)
    assert(m.trailingBytes == 64)
  }

  test("ID3 size past buffer end is not skipped (lying tag ≠ audio)") {
    // claims 1000 body bytes but the buffer ends after 20
    val hdr = Array('I', 'D', '3', 3, 0, 0, 0, 0, 1000 >> 7, 1000 & 0x7f)
      .map(_.toByte)
    val m = MpegAudio.parse(hdr ++ Array.fill(20)(0x00.toByte))
    assert(m.id3Bytes == 0 && m.nFrames == 0 && m.trailingBytes == 30)
  }

  test("empty and sub-header buffers are safe") {
    assert(MpegAudio.parse(Array.emptyByteArray).nFrames == 0)
    assert(MpegAudio.parse(Array[Byte](0xff.toByte, 0xfb.toByte)).trailingBytes == 2)
  }

  // ------------------------------------------------------------ ADTS

  private def adtsFrames(n: Int, k: Int): Seq[(Int, Boolean, Int)] =
    (0 until n).map(j => (30 + (k * 3 + j * 7) % 200, (k + j) % 3 == 0, (k + j) % 3))

  test("ADTS round-trip: parse recovers the synthetic frame plan exactly") {
    for (k <- 0 until 50) {
      val frames = adtsFrames(4 + k % 7, k)
      val bytes = MpegAudio.encodeSyntheticAdts(k % 13, k % 4, 1 + k % 6, frames)
      val m = MpegAudio.parseAdts(bytes)
      assert(m.sampleRate == MpegAudio.AdtsSampleRateHz(k % 13))
      assert(m.profile == k % 4 && m.channelConfig == 1 + k % 6)
      assert(m.nFrames == frames.length)
      assert(m.nRawBlocks == frames.map(_._3 + 1).sum.toLong)
      assert(m.sumFrameBytes ==
        frames.map(f => f._1 + (if (f._2) 9 else 7)).sum.toLong)
      assert(m.nCrcFrames == frames.count(_._2))
      assert(m.durationUs ==
        frames.map(_._3 + 1).sum.toLong * 1024L * 1000000L /
          MpegAudio.AdtsSampleRateHz(k % 13))
      assert(m.trailingBytes == 0)
    }
  }

  test("ADTS truncated final frame and trailing garbage are reported, not guessed") {
    val full = MpegAudio.encodeSyntheticAdts(4, 1, 2, adtsFrames(4, 5))
    val m1 = MpegAudio.parseAdts(full.dropRight(3))
    assert(m1.nFrames == 3)
    val m2 = MpegAudio.parseAdts(full ++ Array.fill(11)(0x42.toByte))
    assert(m2.nFrames == 4 && m2.trailingBytes == 11)
  }

  test("ADTS reserved sample-rate index and layer != 00 stop the walk") {
    val good = MpegAudio.encodeSyntheticAdts(0, 0, 1, adtsFrames(2, 1))
    // srIdx 13 (reserved): byte2 = (prof<<6)|(13<<2)
    val badSr = Array(0xff, 0xf1, (0 << 6) | (13 << 2), 0x40, 0x10, 0x3f, 0xfc)
      .map(_.toByte)
    assert(MpegAudio.parseAdts(good ++ badSr).nFrames == 2)
    val badLayer = Array(0xff, 0xf7, 0x10, 0x40, 0x10, 0x3f, 0xfc).map(_.toByte)
    assert(MpegAudio.parseAdts(good ++ badLayer).nFrames == 2)
  }

  test("ADTS frame length below header size stops (malformed, would loop forever)") {
    // frameLen = 5 < 7: bytes 3-5 encode len
    val hdr = Array(0xff, 0xf1, 0x10, 0x40 | 0x0, (5 >> 3) & 0xff,
      ((5 & 7) << 5) | 0x1f, 0xfc).map(_.toByte)
    val m = MpegAudio.parseAdts(hdr ++ Array.fill(30)(0x00.toByte))
    assert(m.nFrames == 0 && m.trailingBytes == 37)
  }

  test("mp3Features DataFrame path matches parse row-for-row") {
    import spark.implicits._
    // built driver-side: the closure must not capture the (non-serializable) spec
    val data = (0L until 20L).map { id =>
      val k = (id % 50).toInt
      (id, MpegAudio.encodeSynthetic(k % 200, k % 3, mkFrames(5 + k % 9, k)))
    }
    val df = spark.createDataset(data).toDF("doc_id", "payload")
    val out = MpegAudio.mp3Features(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val k = (r.getLong(0) % 50).toInt
      val m = MpegAudio.parse(
        MpegAudio.encodeSynthetic(k % 200, k % 3, mkFrames(5 + k % 9, k)))
      assert(r.getInt(1) == m.id3Bytes && r.getInt(2) == m.sampleRate &&
        r.getLong(3) == m.nFrames.toLong && r.getLong(4) == m.sumBitrateKbps)
    }
  }
}
