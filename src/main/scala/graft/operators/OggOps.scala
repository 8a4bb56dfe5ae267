package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Ogg page walker (RFC 3533) — the open-container member of the
  * audio-triage family ([[MpegAudio]] MP3/ADTS): Opus/Vorbis corpora
  * ship as Ogg streams, a sequence of pages each framed as
  *
  *   `OggS` · version(1) · header_type(1: continued/BOS/EOS bits) ·
  *   granule_position(8 LE) · serial(4 LE) · page_seq(4 LE) ·
  *   crc32(4 LE) · n_segments(1) · segment_table(n) · payload(Σ table)
  *
  * Walking pages gives the audio census before any codec decode:
  * logical-stream count (BOS pages), duration from the final granule
  * position (48 kHz ticks for Opus — granule/48 = ms), payload mass
  * vs header overhead, packet-continuation rate. The page CRC is
  * VERIFIED (Ogg's own CRC-32: poly 0x04C11DB7, unreflected, zero
  * init/xor, computed with the CRC field zeroed) — without it a
  * corrupt segment table silently desynchronizes every later page,
  * the same failure mode the tar checksum guards against.
  *
  * Contract (stop-don't-guess): bad magic, unknown version, short
  * header/table/payload, or CRC mismatch stop the walk at that
  * page's offset; the remainder is `trailing_bytes`.
  */
object OggOps {

  final case class OggMeta(
      nPages: Int,
      nBos: Int,
      nEos: Int,
      nContinued: Int,
      payloadBytes: Long,
      headerBytes: Long,     // 27 fixed + segment table per page
      lastGranule: Long,
      durationMs: Long,      // lastGranule / 48 (Opus 48 kHz ticks)
      trailingBytes: Long)

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Ogg CRC-32 over a buffer slice. */
  def crc(bytes: Array[Byte], off: Int, len: Int): Int = {
    var r = 0
    var i = off
    val end = off + len
    while (i < end) {
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    r
  }

  /** Deterministic single-serial Ogg stream from a per-page plan of
    * (headerType, granule, segment lengths). CRCs are correct.
    */
  def encodeSynthetic(plan: Seq[(Int, Long, Seq[Int])], serial: Int = 0x1234): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    plan.zipWithIndex.foreach { case ((hType, granule, segs), seq) =>
      val payloadLen = segs.sum
      val page = new Array[Byte](27 + segs.length + payloadLen)
      page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
      page(4) = 0 // version
      page(5) = hType.toByte
      var g = granule
      var i = 0
      while (i < 8) { page(6 + i) = (g & 0xff).toByte; g >>>= 8; i += 1 }
      var sr = serial
      i = 0
      while (i < 4) { page(14 + i) = (sr & 0xff).toByte; sr >>>= 8; i += 1 }
      var sq = seq
      i = 0
      while (i < 4) { page(18 + i) = (sq & 0xff).toByte; sq >>>= 8; i += 1 }
      // crc at 22..25 stays zero for the computation
      page(26) = segs.length.toByte
      segs.zipWithIndex.foreach { case (sl, si) => page(27 + si) = sl.toByte }
      var p = 27 + segs.length
      var b = 0
      while (b < payloadLen) { page(p + b) = ((b * 17 + seq * 31) % 256).toByte; b += 1 }
      val c = crc(page, 0, page.length)
      page(22) = (c & 0xff).toByte
      page(23) = ((c >>> 8) & 0xff).toByte
      page(24) = ((c >>> 16) & 0xff).toByte
      page(25) = ((c >>> 24) & 0xff).toByte
      bos.write(page)
    }
    bos.toByteArray
  }

  /** The one CRC-verified page walk both censuses share: calls `f`
    * per VALID page with (headerType, granule, serial, segment count,
    * payload offset, payload length) and returns the position after
    * the last valid page (everything from there on is trailing —
    * stop-don't-guess on bad magic/version, short header/table/
    * payload, or CRC mismatch).
    */
  private def walkPages(bytes: Array[Byte])
      (f: (Int, Long, Int, Int, Int, Int) => Unit): Int = {
    val n = bytes.length
    var pos = 0
    var ok = true
    while (ok && pos < n) {
      if (pos + 27 > n || bytes(pos) != 'O' || bytes(pos + 1) != 'g' ||
        bytes(pos + 2) != 'g' || bytes(pos + 3) != 'S' || bytes(pos + 4) != 0) ok = false
      else {
        val nSegs = bytes(pos + 26) & 0xff
        if (pos + 27 + nSegs > n) ok = false
        else {
          var payloadLen = 0
          var i = 0
          while (i < nSegs) { payloadLen += bytes(pos + 27 + i) & 0xff; i += 1 }
          val total = 27 + nSegs + payloadLen
          if (total > n - pos) ok = false
          else {
            // CRC with the stored field read as zeros (no input mutation)
            val stored = (bytes(pos + 22) & 0xff) | ((bytes(pos + 23) & 0xff) << 8) |
              ((bytes(pos + 24) & 0xff) << 16) | ((bytes(pos + 25) & 0xff) << 24)
            var actual = 0
            var ci = pos
            val cEnd = pos + total
            while (ci < cEnd) {
              val b = if (ci >= pos + 22 && ci < pos + 26) 0 else bytes(ci) & 0xff
              actual = (actual << 8) ^ CrcTable(((actual >>> 24) ^ b) & 0xff)
              ci += 1
            }
            if (actual != stored) ok = false
            else {
              val hType = bytes(pos + 5) & 0xff
              var g = 0L
              i = 7
              while (i >= 0) { g = (g << 8) | (bytes(pos + 6 + i) & 0xff); i -= 1 }
              var serial = 0
              i = 3
              while (i >= 0) { serial = (serial << 8) | (bytes(pos + 14 + i) & 0xff); i -= 1 }
              f(hType, g, serial, nSegs, pos + 27 + nSegs, payloadLen)
              pos += total
            }
          }
        }
      }
    }
    pos
  }

  def parse(bytes: Array[Byte]): OggMeta = {
    var nPages = 0; var nBos = 0; var nEos = 0; var nCont = 0
    var payload = 0L; var header = 0L; var lastGranule = 0L
    val pos = walkPages(bytes) { (hType, g, _, nSegs, _, payloadLen) =>
      nPages += 1
      if ((hType & 0x01) != 0) nCont += 1
      if ((hType & 0x02) != 0) nBos += 1
      if ((hType & 0x04) != 0) nEos += 1
      payload += payloadLen
      header += 27 + nSegs
      if (g != -1L) lastGranule = g // -1 marks a no-granule page
    }
    OggMeta(nPages, nBos, nEos, nCont, payload, header, lastGranule,
      lastGranule / 48, (bytes.length - pos).toLong)
  }

  // ---- codec identification from the first packet of each BOS page
  // (RFC 7845 §5.1 OpusHead / Vorbis I §4.2.2 identification header /
  // Ogg-FLAC mapping byte) — closed-form fixed-offset fields, no
  // entropy decode, completing the audio-triage family the way GGUF
  // completed the weights containers.

  /** Codec ids for [[OggCodecMeta]]: 0 = unrecognized/malformed BOS
    * packet, 1 = Opus, 2 = Vorbis, 3 = FLAC-in-Ogg.
    */
  val CodecOther = 0; val CodecOpus = 1; val CodecVorbis = 2; val CodecFlac = 3

  final case class OggCodecMeta(
      nStreams: Int,        // BOS pages = logical streams
      nOpus: Int,
      nVorbis: Int,
      nFlac: Int,
      nOtherCodec: Int,     // BOS present but first packet unrecognized
      codecId: Int,         // FIRST stream's codec (CodecOther if none)
      channels: Int,        // first stream (0 when unrecognized)
      sampleRate: Long,     // Opus: input rate; Vorbis: audio rate
      preSkip: Int,         // Opus only (0 otherwise)
      opusDurationMs: Long, // (lastGranule − preSkip)/48, ≥0, Opus first stream only
      trailingBytes: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def hasMagic(b: Array[Byte], off: Int, m: String): Boolean = {
    var i = 0
    while (i < m.length) {
      if (b(off + i) != m.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Classify one BOS page's first packet (payload prefix — the id
    * headers are 19/30 bytes and RFC 7845/Vorbis I require them to be
    * the WHOLE first packet of the first page, so a prefix shorter
    * than the fixed header is malformed, not "other"):
    * (codecId, channels, sampleRate, preSkip). Stop-don't-guess: any
    * length/version violation classifies as [[CodecOther]] with zeroed
    * fields rather than reading fields that are not there.
    */
  private def classify(b: Array[Byte], off: Int, len: Int): (Int, Int, Long, Int) = {
    // OpusHead: magic(8) ver(1, major nibble 0) ch(1) preSkip(2 LE)
    //           inputRate(4 LE) gain(2) mappingFamily(1) = 19 bytes min
    if (len >= 19 && hasMagic(b, off, "OpusHead") && (b(off + 8) & 0xf0) == 0)
      (CodecOpus, b(off + 9) & 0xff, le32(b, off + 10 + 2), le16(b, off + 10))
    // Vorbis id: 0x01 "vorbis" version(4 LE, == 0) ch(1) rate(4 LE)
    //            bitrates(12) blocksizes(1) framing(1) = 30 bytes
    else if (len >= 30 && b(off) == 0x01 && hasMagic(b, off + 1, "vorbis") &&
      le32(b, off + 7) == 0L)
      (CodecVorbis, b(off + 11) & 0xff, le32(b, off + 12), 0)
    // Ogg-FLAC mapping: 0x7F "FLAC" major(1) minor(1) nHeaders(2) "fLaC"
    //                   STREAMINFO block — 13 + 4 + 38 bytes min
    else if (len >= 51 && (b(off) & 0xff) == 0x7f && hasMagic(b, off + 1, "FLAC") &&
      hasMagic(b, off + 9, "fLaC")) {
      // STREAMINFO starts at off+13 (block header 4B, then 34B body);
      // rate: 20 bits at body offset 10; channels: next 3 bits + 1
      val s = off + 13 + 4 + 10
      val rate = ((b(s) & 0xff) << 12) | ((b(s + 1) & 0xff) << 4) | ((b(s + 2) & 0xff) >>> 4)
      val ch = ((b(s + 2) >>> 1) & 0x07) + 1
      (CodecFlac, ch, rate.toLong, 0)
    } else (CodecOther, 0, 0L, 0)
  }

  /** Per-logical-stream codec census: walks the same CRC-verified
    * pages as [[parse]] and classifies each BOS page's first packet.
    * The scalar fields describe the FIRST stream (single-stream files
    * — the overwhelming corpus case — read naturally; multiplexed
    * files still get full per-codec counts). `opusDurationMs` applies
    * RFC 7845 §4's pre-skip correction to the granule clock — the
    * duration a bare page walk overstates by preSkip/48 ms.
    */
  def codecMeta(bytes: Array[Byte]): OggCodecMeta = {
    var nStreams = 0; var nOpus = 0; var nVorbis = 0; var nFlac = 0; var nOther = 0
    var codecId = CodecOther; var channels = 0; var sampleRate = 0L; var preSkip = 0
    var lastGranule = 0L
    val pos = walkPages(bytes) { (hType, g, _, _, payloadOff, payloadLen) =>
      if (g != -1L) lastGranule = g
      if ((hType & 0x02) != 0) {
        nStreams += 1
        val (c, ch, sr, ps) = classify(bytes, payloadOff, payloadLen)
        c match {
          case CodecOpus => nOpus += 1
          case CodecVorbis => nVorbis += 1
          case CodecFlac => nFlac += 1
          case _ => nOther += 1
        }
        if (nStreams == 1) { codecId = c; channels = ch; sampleRate = sr; preSkip = ps }
      }
    }
    val opusMs =
      if (codecId == CodecOpus) math.max(0L, lastGranule - preSkip) / 48 else 0L
    OggCodecMeta(nStreams, nOpus, nVorbis, nFlac, nOther, codecId, channels,
      sampleRate, preSkip, opusMs, (bytes.length - pos).toLong)
  }

  /** A valid OpusHead identification packet (RFC 7845 §5.1). */
  def opusHeadPacket(channels: Int, preSkip: Int, inputRate: Long): Array[Byte] = {
    val b = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(b)
    b(8) = 1
    b(9) = channels.toByte
    b(10) = (preSkip & 0xff).toByte; b(11) = ((preSkip >> 8) & 0xff).toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((inputRate >>> (8 * i)) & 0xff).toByte; i += 1 }
    // output gain 0, mapping family 0 (bytes 16..18 stay zero)
    b
  }

  /** A valid Vorbis identification packet (Vorbis I §4.2.2). */
  def vorbisIdPacket(channels: Int, rate: Long): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 0x01
    "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
    // version (4B) stays zero
    b(11) = channels.toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((rate >>> (8 * i)) & 0xff).toByte; i += 1 }
    // bitrates (12B) stay zero
    b(28) = ((8 << 4) | 11).toByte // blocksizes 2^8 / 2^11
    b(29) = 0x01                   // framing flag
    b
  }

  /** Encode pages carrying EXPLICIT packet payloads (the id-header
    * variant of [[encodeSynthetic]]): per page (headerType, granule,
    * payload). Lacing is real — ⌊len/255⌋ 255-values plus the final
    * len%255 (which correctly emits a terminal 0 for multiples of
    * 255). CRCs are correct.
    */
  def encodeSyntheticPackets(plan: Seq[(Int, Long, Array[Byte])],
                             serial: Int = 0x1234): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    plan.zipWithIndex.foreach { case ((hType, granule, payload), seq) =>
      val segs = Seq.fill(payload.length / 255)(255) :+ (payload.length % 255)
      require(segs.length <= 255, s"packet of ${payload.length} B needs >255 lacing values")
      val page = new Array[Byte](27 + segs.length + payload.length)
      page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
      page(4) = 0
      page(5) = hType.toByte
      var g = granule
      var i = 0
      while (i < 8) { page(6 + i) = (g & 0xff).toByte; g >>>= 8; i += 1 }
      var sr = serial
      i = 0
      while (i < 4) { page(14 + i) = (sr & 0xff).toByte; sr >>>= 8; i += 1 }
      var sq = seq
      i = 0
      while (i < 4) { page(18 + i) = (sq & 0xff).toByte; sq >>>= 8; i += 1 }
      page(26) = segs.length.toByte
      segs.zipWithIndex.foreach { case (sl, si) => page(27 + si) = sl.toByte }
      payload.copyToArray(page, 27 + segs.length)
      val c = crc(page, 0, page.length)
      page(22) = (c & 0xff).toByte
      page(23) = ((c >>> 8) & 0xff).toByte
      page(24) = ((c >>> 16) & 0xff).toByte
      page(25) = ((c >>> 24) & 0xff).toByte
      bos.write(page)
    }
    bos.toByteArray
  }

  /** Map-only codec census — the codec-family shape. */
  def oggCodecFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = codecMeta(bytes)
          (id, m.nStreams.toLong, m.nOpus.toLong, m.nVorbis.toLong,
            m.nFlac.toLong, m.nOtherCodec.toLong, m.codecId.toLong,
            m.channels.toLong, m.sampleRate, m.preSkip.toLong,
            m.opusDurationMs, m.trailingBytes)
        }
      }
      .toDF(idCol, "n_streams", "n_opus", "n_vorbis", "n_flac",
        "n_other_codec", "codec_id", "channels", "sample_rate", "pre_skip",
        "opus_duration_ms", "trailing_bytes")
  }

  /** Map-only dataset census — the codec-family shape. */
  def oggFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.nPages.toLong, m.nBos.toLong, m.nEos.toLong, m.nContinued.toLong,
            m.payloadBytes, m.headerBytes, m.lastGranule, m.durationMs,
            m.trailingBytes)
        }
      }
      .toDF(idCol, "n_pages", "n_bos", "n_eos", "n_continued",
        "payload_bytes", "header_bytes", "last_granule", "duration_ms",
        "trailing_bytes")
  }
}
