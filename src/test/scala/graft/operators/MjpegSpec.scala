package graft.operators

import graft.SparkSpec

/** Motion-JPEG AVI: real compressed round-trips (bounded JPEG error,
  * exact structure), frame-order preservation, strict cross-format
  * rejection, and the dual-format luma-stats dispatch.
  */
class MjpegSpec extends SparkSpec {

  private def flat(w: Int, h: Int, v: Int) = Array.fill(w * h)(v)

  test("round-trip: exact structure, bounded pixel error on flat frames") {
    val (w, h) = (20, 14)
    val frames = Seq(flat(w, h, 30), flat(w, h, 220), flat(w, h, 30))
    val bytes = VideoCodec.encodeMjpegAvi(w, h, 10, frames)
    val Some((dw, dh, decoded)) = VideoCodec.decodeMjpegAvi(bytes)
    assert(dw == w && dh == h && decoded.length == 3)
    decoded.zip(frames).foreach { case (d, o) =>
      d.zip(o).foreach { case (dv, ov) => assert(math.abs(dv - ov) <= 4, s"$dv vs $ov") }
    }
  }

  test("gradient frames survive with bounded error (a real DCT ran)") {
    val (w, h) = (24, 16)
    val grad = Array.tabulate(w * h)(i => ((i % w) * 8 + (i / w) * 4) % 256)
    val Some((_, _, decoded)) = VideoCodec.decodeMjpegAvi(
      VideoCodec.encodeMjpegAvi(w, h, 10, Seq(grad)))
    val maxErr = decoded.head.zip(grad).map { case (d, o) => math.abs(d - o) }.max
    assert(maxErr <= 40, s"JPEG error $maxErr implausibly large")
    assert(decoded.head.toSeq != grad.toSeq, "JPEG round-trip was byte-exact — no real codec ran")
  }

  test("frame order is preserved (distinct luma levels stay sorted)") {
    val (w, h) = (16, 12)
    val levels = Seq(40, 120, 200, 90)
    val bytes = VideoCodec.encodeMjpegAvi(w, h, 10, levels.map(flat(w, h, _)))
    val Some((_, _, decoded)) = VideoCodec.decodeMjpegAvi(bytes)
    val means = decoded.map(f => f.sum / f.length)
    means.zip(levels).foreach { case (m, l) => assert(math.abs(m - l) <= 4, s"$m vs $l") }
  }

  test("cross-format rejection: DIB is not MJPEG and vice versa") {
    val dib = VideoCodec.encodeDibAvi(12, 10, 10, Seq(Array.fill(120)(7)))
    val mjpg = VideoCodec.encodeMjpegAvi(12, 10, 10, Seq(flat(12, 10, 7)))
    assert(VideoCodec.decodeMjpegAvi(dib).isEmpty)
    assert(VideoCodec.decodeDibAvi(mjpg).isEmpty)
    assert(VideoCodec.decodeMjpegAvi(mjpg.take(40)).isEmpty)
    // a frame chunk that is not a decodable JPEG fails the clip
    val bad = mjpg.clone()
    val soi = bad.indices.find(i => (bad(i) & 0xff) == 0xff && i + 1 < bad.length &&
      (bad(i + 1) & 0xff) == 0xd8).get
    bad(soi) = 0
    assert(VideoCodec.decodeMjpegAvi(bad).isEmpty)
  }

  test("decodeVideoLumaStats dispatches DIB and MJPEG in one pass") {
    import spark.implicits._
    val dib = VideoCodec.encodeDibAvi(12, 10, 10,
      Seq(Array.fill(120)(200), Array.fill(120)(200)))
    val mjpg = VideoCodec.encodeMjpegAvi(16, 12, 10,
      Seq(flat(16, 12, 220), flat(16, 12, 30), flat(16, 12, 220)))
    val df = Seq((1L, dib), (2L, mjpg), (3L, Array[Byte](1, 2))).toDF("doc_id", "payload")
    val out = VideoCodec.decodeVideoLumaStats(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    // DIB clip: 2 identical bright frames → static, both bright, exact
    assert(out(0).getBoolean(1) && out(0).getLong(2) == 2 &&
      out(0).getLong(5) == 2 && out(0).getLong(6) == 0)
    // MJPEG clip: bright/dark/bright → 2 bright frames, large motion
    assert(out(1).getBoolean(1) && out(1).getLong(2) == 3 && out(1).getLong(5) == 2)
    assert(out(1).getLong(6) > 95L * 16 * 12)
    assert(!out(2).getBoolean(1))
  }
}
