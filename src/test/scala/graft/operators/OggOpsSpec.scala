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

  test("negative granules other than -1 are no-granule too (wrap-proof clock)") {
    // Long.MinValue is attacker-controlled: if recorded as lastGranule,
    // (lastGranule - preSkip) wraps POSITIVE past the max(0,·) clamp and
    // reports a huge bogus duration; the whole negative range must act
    // like the -1 marker
    val s = OggOps.encodeSynthetic(Seq(
      (2, 0L, Seq(10)),
      (0, 960L, Seq(20)),
      (0, Long.MinValue, Seq(30)),
      (4, -42L, Seq(5))))
    val m = OggOps.parse(s)
    assert(m.lastGranule == 960L && m.durationMs == 20L)
  }

  test("empty input parses to zero everything") {
    val m = OggOps.parse(Array.emptyByteArray)
    assert(m.nPages == 0 && m.trailingBytes == 0)
  }

  // ---- codec identification (q367): OpusHead / Vorbis id / Ogg-FLAC

  test("Opus stream: codec, channels, rate, pre-skip, corrected duration") {
    val s = OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.opusHeadPacket(2, 312, 48000L)),
      (0, 0L, Array.fill(45)(7.toByte)),        // tags stand-in
      (4, 4800L, Array.fill(100)(9.toByte))))
    val m = OggOps.codecMeta(s)
    assert(m.nStreams == 1 && m.nOpus == 1 && m.nVorbis == 0 && m.nOtherCodec == 0)
    assert(m.codecId == OggOps.CodecOpus && m.channels == 2)
    assert(m.sampleRate == 48000L && m.preSkip == 312)
    // RFC 7845 §4: duration = (granule - preSkip) / 48 — the page walk
    // alone would say 4800/48 = 100 ms; the corrected value is 93
    assert(m.opusDurationMs == (4800 - 312) / 48 && m.trailingBytes == 0)
  }

  test("Vorbis stream: codec, channels, rate; no pre-skip") {
    val s = OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.vorbisIdPacket(6, 44100L)),
      (4, 88200L, Array.fill(64)(3.toByte))))
    val m = OggOps.codecMeta(s)
    assert(m.codecId == OggOps.CodecVorbis && m.nVorbis == 1)
    assert(m.channels == 6 && m.sampleRate == 44100L)
    assert(m.preSkip == 0 && m.opusDurationMs == 0)
  }

  test("FLAC-in-Ogg mapping: rate and channels from STREAMINFO") {
    val prefix = Array[Byte](0x7f, 'F', 'L', 'A', 'C', 1, 0, 0, 1)
    val pkt = prefix ++ FlacOps.encodeSynthetic(22050, 2, 16, 1000L, Nil, 0)
    val m = OggOps.codecMeta(OggOps.encodeSyntheticPackets(Seq((2, 0L, pkt))))
    assert(m.codecId == OggOps.CodecFlac && m.nFlac == 1)
    assert(m.channels == 2 && m.sampleRate == 22050L)
  }

  test("multiplexed streams: per-codec counts, scalars from the FIRST BOS") {
    val pages = Seq(
      (2, 0L, OggOps.opusHeadPacket(1, 100, 48000L)),
      (2, 0L, OggOps.vorbisIdPacket(2, 32000L)),
      (4, 960L, Array.fill(10)(1.toByte)))
    val m = OggOps.codecMeta(OggOps.encodeSyntheticPackets(pages))
    assert(m.nStreams == 2 && m.nOpus == 1 && m.nVorbis == 1)
    assert(m.codecId == OggOps.CodecOpus && m.channels == 1 && m.preSkip == 100)
  }

  test("malformed id headers classify as other, never field-guess") {
    // truncated OpusHead (18 of 19 bytes): magic matches, fields absent
    val shortOpus = OggOps.codecMeta(OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.opusHeadPacket(2, 312, 48000L).take(18)))))
    assert(shortOpus.codecId == OggOps.CodecOther && shortOpus.nOtherCodec == 1)
    assert(shortOpus.channels == 0 && shortOpus.sampleRate == 0L)
    // incompatible Opus major version (high nibble nonzero)
    val badVer = OggOps.opusHeadPacket(2, 312, 48000L)
    badVer(8) = 0x10
    val mv = OggOps.codecMeta(OggOps.encodeSyntheticPackets(Seq((2, 0L, badVer))))
    assert(mv.codecId == OggOps.CodecOther)
    // nonzero Vorbis version field
    val badVorbis = OggOps.vorbisIdPacket(2, 44100L)
    badVorbis(7) = 1
    val mvv = OggOps.codecMeta(OggOps.encodeSyntheticPackets(Seq((2, 0L, badVorbis))))
    assert(mvv.codecId == OggOps.CodecOther)
    // a CRC flip on the id page stops the walk: no stream at all
    val good = OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.opusHeadPacket(2, 312, 48000L))))
    good(30) = (good(30) ^ 1).toByte
    val mc = OggOps.codecMeta(good)
    assert(mc.nStreams == 0 && mc.trailingBytes == good.length)
  }

  // ---- Opus packet TOC census (q369)

  private def opusStream(dataPackets: Seq[Array[Byte]]): Array[Byte] =
    OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.opusHeadPacket(2, 312, 48000L)),
      (0, 0L, "OpusTags".getBytes("US-ASCII"))) ++
      dataPackets.zipWithIndex.map { case (p, i) =>
        (if (i == dataPackets.size - 1) 4 else 0, 960L * (i + 1), p)
      })

  test("TOC census: modes, stereo, frame codes, exact duration") {
    // config 1 = SILK NB 20 ms mono code 0; config 17 = CELT NB 5 ms
    // stereo code 2 (2 frames); config 14 = hybrid FB 10 ms code 3 × 4
    val s = opusStream(Seq(
      Array(((1 << 3) | 0).toByte, 9, 9),
      Array(((17 << 3) | (1 << 2) | 2).toByte, 9),
      Array(((14 << 3) | 3).toByte, 4.toByte, 9, 9)))
    val m = OggOps.opusTocCensus(s)
    assert(m.nAudioPackets == 3 && m.nMalformed == 0 && m.trailingBytes == 0)
    assert(m.nSilk == 1 && m.nCelt == 1 && m.nHybrid == 1)
    assert(m.nStereo == 1 && m.nCode3 == 1)
    assert(m.totalFrames == 1 + 2 + 4)
    assert(m.durationUs == 20000L + 2 * 5000L + 4 * 10000L)
  }

  test("TOC census assembles packets spanning pages (255-lacing continuation)") {
    // one audio packet of 300 bytes: 255 on the data page, 45 on a
    // continuation page (header_type bit 0) — ONE packet, not two
    val head = OggOps.opusHeadPacket(2, 0, 48000L)
    val tags = "OpusTags".getBytes("US-ASCII")
    val toc = ((1 << 3) | 0).toByte // SILK NB 20 ms, code 0
    val big = toc +: Array.fill(299)(7.toByte)
    val pages = Seq(
      OggOps.encodePage(2, 0L, 0x42, 0, OggOps.lacingFor(head.length), head),
      OggOps.encodePage(0, 0L, 0x42, 1, OggOps.lacingFor(tags.length), tags),
      OggOps.encodePage(0, -1L, 0x42, 2, Seq(255), big.take(255)),
      OggOps.encodePage(1 | 4, 960L, 0x42, 3, Seq(45), big.drop(255)))
    val m = OggOps.opusTocCensus(pages.flatten.toArray)
    assert(m.nAudioPackets == 1 && m.totalFrames == 1 && m.durationUs == 20000L)
    assert(m.nMalformed == 0 && m.trailingBytes == 0)
    // a spanning code-3 packet: a continued packet's first chunk is
    // ≥255 bytes by construction (lacing < 255 would terminate it), so
    // TOC and count byte always share the first page — the spanning
    // part is the tail
    val c3 = Array[Byte](((14 << 3) | 3).toByte, 3) ++ Array.fill(253)(1.toByte) ++ Array[Byte](8, 9)
    val pages2 = Seq(
      OggOps.encodePage(2, 0L, 0x43, 0, OggOps.lacingFor(head.length), head),
      OggOps.encodePage(0, 0L, 0x43, 1, OggOps.lacingFor(tags.length), tags),
      OggOps.encodePage(0, -1L, 0x43, 2, Seq(255), c3.take(255)),
      OggOps.encodePage(1 | 4, 960L, 0x43, 3, Seq(2), c3.drop(255)))
    val m2 = OggOps.opusTocCensus(pages2.flatten.toArray)
    assert(m2.nAudioPackets == 1 && m2.nCode3 == 1 && m2.totalFrames == 3)
  }

  test("TOC census malformed classes: empty packet, bad code-3 count, dropped continuation") {
    // zero-length audio packet
    val m0 = OggOps.opusTocCensus(opusStream(Seq(Array.empty[Byte])))
    assert(m0.nAudioPackets == 1 && m0.nMalformed == 1 && m0.totalFrames == 0)
    // code 3 with count byte 0 and count byte 49 — both outside [1, 48]
    for (cnt <- Seq(0, 49)) {
      val m = OggOps.opusTocCensus(opusStream(Seq(
        Array(((1 << 3) | 3).toByte, cnt.toByte, 9))))
      assert(m.nMalformed == 1 && m.nCode3 == 1 && m.totalFrames == 0, s"cnt=$cnt")
    }
    // code 3 with NO count byte (1-byte packet)
    val m1 = OggOps.opusTocCensus(opusStream(Seq(Array(((1 << 3) | 3).toByte))))
    assert(m1.nMalformed == 1)
    // open 255-continued packet never closed (truncated stream)
    val head = OggOps.opusHeadPacket(2, 0, 48000L)
    val open = Seq(
      OggOps.encodePage(2, 0L, 9, 0, OggOps.lacingFor(head.length), head),
      OggOps.encodePage(0, 0L, 9, 1, OggOps.lacingFor(8), "OpusTags".getBytes("US-ASCII")),
      OggOps.encodePage(0, -1L, 9, 2, Seq(255),
        (((1 << 3) | 0).toByte +: Array.fill(254)(1.toByte))))
    val mOpen = OggOps.opusTocCensus(open.flatten.toArray)
    assert(mOpen.nAudioPackets == 1 && mOpen.nMalformed == 1)
    // continuation DROPPED: next page lacks bit 0 while a packet is open
    val dropped = open ++ Seq(
      OggOps.encodePage(4, 960L, 9, 3, Seq(3),
        Array(((17 << 3) | 0).toByte, 9, 9)))
    val mDrop = OggOps.opusTocCensus(dropped.flatten.toArray)
    assert(mDrop.nAudioPackets == 2 && mDrop.nMalformed == 1)
    assert(mDrop.nCelt == 1 && mDrop.durationUs == 5000L)
  }

  test("TOC census refuses to read non-Opus packets as TOCs (review finding)") {
    // a Vorbis stream's packets must NOT be interpreted as Opus TOCs —
    // confident garbage mode/duration stats are worse than malformed
    val s = OggOps.encodeSyntheticPackets(Seq(
      (2, 0L, OggOps.vorbisIdPacket(2, 44100L)),
      (0, 0L, Array.fill(12)(3.toByte)),
      (4, 88200L, Array(((1 << 3) | 0).toByte, 9, 9))))
    val m = OggOps.opusTocCensus(s)
    assert(m.nAudioPackets == 1 && m.nMalformed == 1)
    assert(m.nSilk + m.nHybrid + m.nCelt == 0 && m.durationUs == 0)
  }

  test("codecMeta's duration clock ignores OTHER streams' granules (review finding)") {
    // first stream Opus (48 kHz ticks); a second Vorbis stream's final
    // page carries granule 44100 in SAMPLE ticks — it must not leak
    // into opusDurationMs
    val head = OggOps.opusHeadPacket(2, 312, 48000L)
    val pages = Seq(
      OggOps.encodePage(2, 0L, 0x11, 0, OggOps.lacingFor(head.length), head),
      OggOps.encodePage(2, 0L, 0x22, 0,
        OggOps.lacingFor(30), OggOps.vorbisIdPacket(2, 44100L)),
      OggOps.encodePage(4, 4800L, 0x11, 1, OggOps.lacingFor(3), Array[Byte](1, 2, 3)),
      OggOps.encodePage(4, 44100L, 0x22, 1, OggOps.lacingFor(2), Array[Byte](4, 5)))
    val m = OggOps.codecMeta(pages.flatten.toArray)
    assert(m.nStreams == 2 && m.codecId == OggOps.CodecOpus)
    assert(m.opusDurationMs == (4800 - 312) / 48,
      s"duration ${m.opusDurationMs} leaked the Vorbis stream's 44100-tick clock")
  }

  test("codecMeta: a Long.MinValue granule can't wrap opusDurationMs (review finding)") {
    // with preSkip=312, Long.MinValue - 312 wraps to a huge POSITIVE
    // value that sails past the max(0,·) clamp — the negative granule
    // must be treated as no-granule so the clamp stays wrap-proof
    val head = OggOps.opusHeadPacket(2, 312, 48000L)
    val pages = Seq(
      OggOps.encodePage(2, 0L, 0x11, 0, OggOps.lacingFor(head.length), head),
      OggOps.encodePage(0, 4800L, 0x11, 1, OggOps.lacingFor(3), Array[Byte](1, 2, 3)),
      OggOps.encodePage(4, Long.MinValue, 0x11, 2, OggOps.lacingFor(2), Array[Byte](4, 5)))
    val m = OggOps.codecMeta(pages.flatten.toArray)
    assert(m.codecId == OggOps.CodecOpus)
    assert(m.opusDurationMs == (4800 - 312) / 48,
      s"duration ${m.opusDurationMs} wrapped through Long.MinValue")
  }

  test("encodeSyntheticPackets lacing round-trips packets ≥ 255 bytes") {
    // 255-multiple payloads need the terminal 0 lacing value; the page
    // census and the codec walk must agree on the payload mass
    for (len <- Seq(254, 255, 256, 510, 700)) {
      val s = OggOps.encodeSyntheticPackets(Seq(
        (2, 0L, OggOps.opusHeadPacket(1, 0, 48000L)),
        (4, 960L, Array.fill(len)(5.toByte))))
      val m = OggOps.parse(s)
      assert(m.nPages == 2 && m.payloadBytes == 19L + len, s"len=$len")
      assert(m.trailingBytes == 0, s"len=$len")
      assert(OggOps.codecMeta(s).codecId == OggOps.CodecOpus, s"len=$len")
    }
  }
}
