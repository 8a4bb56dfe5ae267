package graft.operators

import graft.SparkSpec

/** IMA ADPCM decode: hand-computed reference vectors (worked from the
  * published step/index tables, independent of the implementation),
  * predictor/index clamping at both rails, container round-trips
  * including the odd-nibble pad and multi-block state reset, and
  * strict rejection of everything that is not mono 4-bit tag-0x11.
  */
class AdpcmSpec extends SparkSpec {

  test("nibble expansion matches hand-computed reference vectors") {
    // pred0=0, idx0=0 (step 7):
    //   n=2: diff = 7>>3 + 7>>1 = 0+3 = 3  → pred 3,  idx 0-1→0
    //   n=7: diff = 0 + 1 + 3 + 7   = 11 → pred 14, idx 0+8=8 (step 16)
    //   n=10: diff = 16>>3 + 16>>1 = 2+8 = 10, sign → pred 4, idx 8-1=7
    val got = AudioCodec.adpcmDecodeNibbles(0, 0, Array(2, 7, 10))
    assert(got.toSeq == Seq[Short](0, 3, 14, 4))
  }

  test("predictor and index clamp at both rails") {
    // top rail: idx 88 (step 32767), n=7: diff = 4095+8191+16383+32767
    val hi = AudioCodec.adpcmDecodeNibbles(32760, 88, Array(7, 7))
    assert(hi.toSeq == Seq[Short](32760.toShort, 32767, 32767))
    // bottom rail with sign bit (n=15 is n=7 negated)
    val lo = AudioCodec.adpcmDecodeNibbles(-32760, 88, Array(15, 15))
    assert(lo.toSeq == Seq[Short]((-32760).toShort, -32768, -32768))
    // index clamps at 0: n=0 keeps subtracting 1 from idx
    val idle = AudioCodec.adpcmDecodeNibbles(100, 1, Array(0, 0, 0))
    // idx path 1→0→0; steps 8,7,7 → diffs 1,0,0
    assert(idle.toSeq == Seq[Short](100, 101, 101, 101))
  }

  test("container round-trip: odd nibble count, fact-trimmed pad") {
    val nibbles = Array.tabulate(33)(j => (j * 5) % 16) // odd → pad nibble
    val bytes = AudioCodec.encodeImaAdpcmWav(16000, Seq((-200, 12, nibbles)))
    val Some((sr, ch, samples)) = AudioCodec.decodeImaAdpcmWav(bytes)
    assert(sr == 16000 && ch == 1)
    assert(samples.toSeq == AudioCodec.adpcmDecodeNibbles(-200, 12, nibbles).toSeq)
  }

  test("multi-block decode resets state from each block header") {
    val b1 = (1000, 40, Array.tabulate(8)(j => (j * 3) % 16))
    val b2 = (-1000, 2, Array.tabulate(8)(j => (j * 7) % 16))
    val bytes = AudioCodec.encodeImaAdpcmWav(8000, Seq(b1, b2))
    val Some((_, _, samples)) = AudioCodec.decodeImaAdpcmWav(bytes)
    val want = AudioCodec.adpcmDecodeNibbles(b1._1, b1._2, b1._3) ++
      AudioCodec.adpcmDecodeNibbles(b2._1, b2._2, b2._3)
    assert(samples.toSeq == want.toSeq)
  }

  test("rejects PCM payloads, truncation, and out-of-range state") {
    val pcm = AudioCodec.encodePcmWav(8000, 1, Array[Short](1, 2, 3))
    assert(AudioCodec.decodeImaAdpcmWav(pcm).isEmpty)
    val adpcm = AudioCodec.encodeImaAdpcmWav(8000, Seq((0, 0, Array(1, 2, 3, 4))))
    assert(AudioCodec.decodePcmWav(adpcm).isEmpty) // and vice versa
    assert(AudioCodec.decodeImaAdpcmWav(adpcm.take(20)).isEmpty)
    assert(AudioCodec.decodeImaAdpcmWav(Array[Byte](1, 2, 3)).isEmpty)
    // idx0 byte > 88 in the block header is corrupt per spec
    val bad = adpcm.clone()
    // fmt(8+20=28) + fact(8+4=12) headers before data; idx0 is byte 3 of
    // the data payload — locate the 'data' tag instead of hardcoding
    val dataAt = bad.indices.find(i => i + 4 < bad.length &&
      bad(i) == 'd' && bad(i + 1) == 'a' && bad(i + 2) == 't' && bad(i + 3) == 'a').get
    bad(dataAt + 8 + 2) = 120.toByte
    assert(AudioCodec.decodeImaAdpcmWav(bad).isEmpty)
  }

  test("decodeAudioFeatures dispatches PCM and ADPCM payloads in one pass") {
    import spark.implicits._
    val pcm = AudioCodec.encodePcmWav(8000, 1, Array[Short](5, -5, 5))
    val adp = AudioCodec.encodeImaAdpcmWav(16000, Seq((0, 0, Array(2, 10))))
    val df = Seq((1L, pcm), (2L, adp), (3L, Array[Byte](9, 9))).toDF("doc_id", "payload")
    val out = AudioCodec.decodeAudioFeatures(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 8000 && out(0).getLong(6) == 2) // 2 zero-crossings
    assert(out(1).getBoolean(1) && out(1).getInt(2) == 16000 && out(1).getLong(3) == 3) // 3 samples
    assert(!out(2).getBoolean(1))
  }

  test("a crafted samplesPerBlock of 0 fails closed, not a negative alloc") {
    val b = AudioCodec.encodeImaAdpcmWav(8000, Seq((0, 0, Array.tabulate(8)(i => i % 16))))
    // fmt chunk at 12, size 20; samplesPerBlock is its last field (abs 38-39)
    assert((b(38) & 0xff) + ((b(39) & 0xff) << 8) > 0, "layout changed?")
    b(38) = 0; b(39) = 0
    assert(AudioCodec.decodeImaAdpcmWav(b).isEmpty)
  }
}
