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

  def parse(bytes: Array[Byte]): OggMeta = {
    val n = bytes.length
    var pos = 0
    var nPages = 0; var nBos = 0; var nEos = 0; var nCont = 0
    var payload = 0L; var header = 0L; var lastGranule = 0L
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
          if (pos + total > n) ok = false
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
              nPages += 1
              if ((hType & 0x01) != 0) nCont += 1
              if ((hType & 0x02) != 0) nBos += 1
              if ((hType & 0x04) != 0) nEos += 1
              payload += payloadLen
              header += 27 + nSegs
              if (g != -1L) lastGranule = g // -1 marks a no-granule page
              pos += total
            }
          }
        }
      }
    }
    OggMeta(nPages, nBos, nEos, nCont, payload, header, lastGranule,
      lastGranule / 48, (n - pos).toLong)
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
