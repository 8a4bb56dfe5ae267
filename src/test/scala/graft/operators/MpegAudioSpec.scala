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
