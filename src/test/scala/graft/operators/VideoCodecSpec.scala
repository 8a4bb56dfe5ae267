package graft.operators

import graft.SparkSpec

class VideoCodecSpec extends SparkSpec {

  private def frame(w: Int, h: Int, t: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 13 + t * 29) % 211)

  test("AVI encode → decode round-trips DIB frames exactly (incl. stride padding)") {
    // w = 13 is NOT a multiple of 4 ⇒ row stride padding is exercised
    val (w, h) = (13, 5)
    val fs = (0 until 3).map(t => frame(w, h, t))
    val avi = VideoCodec.encodeDibAvi(w, h, 10, fs)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val Some((dw, dh, dec)) = VideoCodec.decodeDibAvi(avi)
    assert(dw == w && dh == h && dec.length == 3)
    for (t <- 0 until 3) assert(dec(t).toSeq == fs(t).toSeq, s"frame $t")
  }

  test("decodeDibAvi undoes bottom-up row order") {
    // 4×2 image: top row 0..3, bottom row 4..7 — in the file the bottom
    // row is stored FIRST; a parser that ignores DIB order returns rows
    // flipped
    val pix = Array(0, 1, 2, 3, 4, 5, 6, 7)
    val avi = VideoCodec.encodeDibAvi(4, 2, 10, Seq(pix))
    // raw frame bytes inside the container: bottom row first
    val moviAt = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    val frameBody = avi.slice(moviAt + 12, moviAt + 12 + 8)
    assert(frameBody.toSeq.map(_ & 0xff) == Seq(4, 5, 6, 7, 0, 1, 2, 3))
    val Some((_, _, dec)) = VideoCodec.decodeDibAvi(avi)
    assert(dec.head.toSeq == pix.toSeq)
  }

  test("decodeDibAvi rejects garbage, truncation, and compressed streams") {
    assert(VideoCodec.decodeDibAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.decodeDibAvi(Array.empty[Byte]).isEmpty)
    val avi = VideoCodec.encodeDibAvi(8, 4, 10, Seq(frame(8, 4, 0)))
    assert(VideoCodec.decodeDibAvi(avi.take(avi.length - 10)).isEmpty)
    // flip biCompression (strf body offset 16) to 1 = BI_RLE8
    val strfAt = avi.indexOfSlice("strf".getBytes("US-ASCII"))
    val rle = avi.clone(); rle(strfAt + 8 + 16) = 1
    assert(VideoCodec.decodeDibAvi(rle).isEmpty)
  }

  test("decodeVideoFeatures computes exact motion energy and surfaces bad rows") {
    import spark.implicits._
    // two 2×2 frames: motion = |5-1|+|5-2|+|5-3|+|5-4| = 4+3+2+1 = 10
    val f0 = Array(1, 2, 3, 4)
    val f1 = Array(5, 5, 5, 5)
    val avi = VideoCodec.encodeDibAvi(2, 2, 10, Seq(f0, f1))
    val df = Seq((1L, avi), (2L, Array[Byte](0, 0))).toDF("id", "payload")
    val out = VideoCodec.decodeVideoFeatures(df, "id", "payload").orderBy("id").collect()
    assert(out(0).getBoolean(1) && out(0).getLong(2) == 2L)
    assert(out(0).getInt(3) == 2 && out(0).getInt(4) == 2)
    assert(out(0).getLong(5) == 10L) // sum_first = 1+2+3+4
    assert(out(0).getLong(6) == 10L) // motion_abs
    assert(!out(1).getBoolean(1))
  }

  test("adversarially deep LIST nesting is rejected, not recursed into") {
    // a LIST per 12 bytes: 100k levels would overflow the stack if the
    // walk recursed unbounded — all three decoders must return None
    val depth = 100000
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + depth * 12)
    out.write("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until depth) {
      out.write("LIST".getBytes("US-ASCII"))
      le32((depth - 1 - i) * 12 + 4) // each level wraps the next exactly
      out.write("xxxx".getBytes("US-ASCII"))
    }
    val bytes = out.toByteArray
    assert(VideoCodec.decodeDibAvi(bytes).isEmpty)
    assert(VideoCodec.decodeRle8Avi(bytes).isEmpty)
    assert(VideoCodec.decodeMjpegAvi(bytes).isEmpty)
  }

  test("a static clip has exactly zero motion") {
    val f = frame(7, 6, 3)
    val avi = VideoCodec.encodeDibAvi(7, 6, 10, Seq(f, f, f))
    val Some((_, _, dec)) = VideoCodec.decodeDibAvi(avi)
    val motion = (1 until dec.length).map { t =>
      dec(t).zip(dec(t - 1)).map { case (a, b) => math.abs(a - b) }.sum
    }.sum
    assert(motion == 0)
  }
}
