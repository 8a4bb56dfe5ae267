package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random round-trip properties for the three real media codecs:
  * arbitrary shapes/content through encode → decode must reproduce the
  * source exactly (every format here is lossless by construction).
  * Pure JVM — no SparkSession needed.
  */
class MediaRoundTripSpec extends AnyFunSuite {

  test("PNG property: random dims + pixels round-trip exactly (100 seeded shapes)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 100) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val png = MultimodalCodec.encodeGrayPng(w, h, (x, y) => pix(y * w + x))
      val Some((dw, dh, dec)) = MultimodalCodec.decodeGray(png)
      assert(dw == w && dh == h, s"trial $trial dims")
      assert(dec.toSeq == pix.toSeq, s"trial $trial pixels ($w x $h)")
    }
  }

  test("WAV property: random rates/channels/samples round-trip exactly (100 seeded shapes)") {
    val rnd = new scala.util.Random(43)
    for (trial <- 0 until 100) {
      val sr = 1 + rnd.nextInt(96000)
      val ch = 1 + rnd.nextInt(4)
      val n = rnd.nextInt(500) // zero-sample clips included
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val Some((dsr, dch, dec)) =
        AudioCodec.decodePcmWav(AudioCodec.encodePcmWav(sr, ch, samples))
      assert(dsr == sr && dch == ch, s"trial $trial header")
      assert(dec.toSeq == samples.toSeq, s"trial $trial samples (sr=$sr ch=$ch n=$n)")
    }
  }

  test("AVI property: random dims/frame-counts round-trip exactly (60 seeded shapes)") {
    val rnd = new scala.util.Random(44)
    for (trial <- 0 until 60) {
      val w = 1 + rnd.nextInt(33) // hits every stride-padding residue mod 4
      val h = 1 + rnd.nextInt(20)
      val nf = 1 + rnd.nextInt(8)
      val frames = Seq.fill(nf)(Array.fill(w * h)(rnd.nextInt(256)))
      val Some((dw, dh, dec)) =
        VideoCodec.decodeDibAvi(VideoCodec.encodeDibAvi(w, h, 10, frames))
      assert(dw == w && dh == h && dec.length == nf, s"trial $trial shape ($w x $h x $nf)")
      for (t <- 0 until nf)
        assert(dec(t).toSeq == frames(t).toSeq, s"trial $trial frame $t ($w x $h)")
    }
  }

  test("decoders never throw on seeded random garbage (500 buffers each)") {
    val rnd = new scala.util.Random(45)
    for (_ <- 0 until 500) {
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      MultimodalCodec.decodeGray(bytes)
      assert(AudioCodec.decodePcmWav(bytes).isEmpty)
      assert(VideoCodec.decodeDibAvi(bytes).isEmpty)
    }
  }

  test("decoders never throw on truncations of valid files (every prefix)") {
    val wav = AudioCodec.encodePcmWav(8000, 1, Array.tabulate(50)(i => (i * 991).toShort))
    val avi = VideoCodec.encodeDibAvi(9, 5, 10,
      Seq(Array.tabulate(45)(_ * 5 % 256), Array.tabulate(45)(_ * 7 % 256)))
    for (cut <- 0 until wav.length) AudioCodec.decodePcmWav(wav.take(cut))
    for (cut <- 0 until avi.length) VideoCodec.decodeDibAvi(avi.take(cut))
    // and the full files still decode after all that
    assert(AudioCodec.decodePcmWav(wav).nonEmpty)
    assert(VideoCodec.decodeDibAvi(avi).nonEmpty)
  }
}
