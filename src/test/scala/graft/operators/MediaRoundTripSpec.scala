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

  test("ADPCM property: random block states/nibbles round-trip exactly (100 seeded shapes)") {
    val rnd = new scala.util.Random(46)
    for (trial <- 0 until 100) {
      val nBlocks = 1 + rnd.nextInt(3)
      val nib = 1 + rnd.nextInt(64)
      val blocks = Seq.fill(nBlocks)((
        rnd.nextInt(65536) - 32768, rnd.nextInt(89),
        Array.fill(nib)(rnd.nextInt(16))))
      val sr = 8000 * (1 + rnd.nextInt(6))
      val Some((dsr, ch, dec)) =
        AudioCodec.decodeImaAdpcmWav(AudioCodec.encodeImaAdpcmWav(sr, blocks))
      assert(dsr == sr && ch == 1, s"trial $trial")
      val want = blocks.flatMap { case (p0, i0, ns) =>
        AudioCodec.adpcmDecodeNibbles(p0, i0, ns) }
      assert(dec.toSeq == want, s"trial $trial ($nBlocks blocks x $nib nibbles)")
    }
  }

  test("MJPEG property: random dims/frames keep structure and bounded luma error (40 seeded shapes)") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 40) {
      val w = 8 + rnd.nextInt(25)
      val h = 8 + rnd.nextInt(16)
      val nf = 1 + rnd.nextInt(5)
      // flat frames at random levels: JPEG must stay within a few grays
      val levels = Seq.fill(nf)(10 + rnd.nextInt(236))
      val frames = levels.map(v => Array.fill(w * h)(v))
      val Some((dw, dh, dec)) =
        VideoCodec.decodeMjpegAvi(VideoCodec.encodeMjpegAvi(w, h, 10, frames))
      assert(dw == w && dh == h && dec.length == nf, s"trial $trial shape ($w x $h x $nf)")
      for (t <- 0 until nf) {
        val mean = dec(t).sum / dec(t).length
        assert(math.abs(mean - levels(t)) <= 4,
          s"trial $trial frame $t mean $mean vs ${levels(t)}")
      }
    }
  }

  test("decoders never throw on seeded random garbage (500 buffers each)") {
    val rnd = new scala.util.Random(45)
    for (_ <- 0 until 500) {
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      MultimodalCodec.decodeGray(bytes)
      assert(AudioCodec.decodePcmWav(bytes).isEmpty)
      assert(AudioCodec.decodeImaAdpcmWav(bytes).isEmpty)
      assert(VideoCodec.decodeMjpegAvi(bytes).isEmpty)
      assert(VideoCodec.decodeDibAvi(bytes).isEmpty)
    }
  }

  test("decoders never throw on truncations of valid files (every prefix)") {
    val wav = AudioCodec.encodePcmWav(8000, 1, Array.tabulate(50)(i => (i * 991).toShort))
    val avi = VideoCodec.encodeDibAvi(9, 5, 10,
      Seq(Array.tabulate(45)(_ * 5 % 256), Array.tabulate(45)(_ * 7 % 256)))
    val adp = AudioCodec.encodeImaAdpcmWav(8000,
      Seq((1234, 30, Array.tabulate(21)(_ * 3 % 16))))
    val mjp = VideoCodec.encodeMjpegAvi(9, 8, 10,
      Seq(Array.fill(72)(40), Array.fill(72)(210)))
    for (cut <- 0 until wav.length) AudioCodec.decodePcmWav(wav.take(cut))
    for (cut <- 0 until avi.length) VideoCodec.decodeDibAvi(avi.take(cut))
    for (cut <- 0 until adp.length) AudioCodec.decodeImaAdpcmWav(adp.take(cut))
    for (cut <- 0 until mjp.length) VideoCodec.decodeMjpegAvi(mjp.take(cut))
    // and the full files still decode after all that
    assert(AudioCodec.decodePcmWav(wav).nonEmpty)
    assert(VideoCodec.decodeDibAvi(avi).nonEmpty)
    assert(AudioCodec.decodeImaAdpcmWav(adp).nonEmpty)
    assert(VideoCodec.decodeMjpegAvi(mjp).nonEmpty)
  }
}
