package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** MPEG audio (MP3) frame-HEADER walk — metadata extraction for the
  * dominant lossy audio format without entropy decode.
  *
  * The honest codec boundary (MultimodalStub scaladoc): Huffman/MDCT
  * payload decode needs an external codec library this engine does not
  * ship. But an MP3's *triage* metadata — duration, sample rate,
  * per-frame bitrates, CBR/VBR, tag overhead — lives entirely in
  * closed-form bit fields: every frame starts with a 4-byte header
  * (11-bit sync, version/layer/bitrate/samplerate indices, padding
  * bit) and its byte length is `144·bitrate/samplerate + padding`
  * (MPEG-1 Layer III), so a walker can hop header-to-header across a
  * 100 TB audio corpus reading 4 bytes per ~400 and never touching
  * the entropy-coded payload. This is exactly what production audio
  * curation runs first: drop truncated/corrupt files, bucket by
  * duration/bitrate, bill storage to tag overhead — all before any
  * decoder spins up.
  *
  * Scope kept checkable: MPEG-1 Layer III only (the overwhelmingly
  * common profile), ID3v2 prefix skip (syncsafe size), stop at the
  * first byte that does not parse as a valid complete frame (free-form
  * bitrate 0, reserved indices, truncation) — the remainder is
  * reported as `trailing_bytes`, never guessed at.
  */
object MpegAudio {

  /** MPEG-1 Layer III bitrate table, kbps; index 0 is "free" (walker
    * stops — frame length is not computable), 15 is invalid.
    */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, Hz; index 3 is reserved. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  val SamplesPerFrame = 1152

  final case class Mp3Meta(
      id3Bytes: Int,       // ID3v2 prefix length incl. 10-byte header (0 if none)
      sampleRate: Int,     // from the FIRST frame (0 if no frame parsed)
      nFrames: Int,
      sumBitrateKbps: Long,
      nDistinctBitrates: Int,
      nPadded: Int,
      durationUs: Long,    // nFrames·1152·1e6 / sampleRate, truncating
      trailingBytes: Int)  // bytes after the last complete frame

  /** Build a deterministic MPEG-1 Layer III byte stream (real headers,
    * filler payload): ID3v2 tag of `id3Body` bytes, then frames with
    * the given (bitrateIndex, padding) plan. Used by fixtures/specs —
    * the ground truth is the HEADER ARITHMETIC, so the walker's decode
    * gates exactly against an oracle that replays the plan.
    */
  def encodeSynthetic(id3Body: Int, srIndex: Int,
                      frames: Seq[(Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Body >= 0) {
      bos.write('I'); bos.write('D'); bos.write('3')
      bos.write(3); bos.write(0) // version 2.3.0
      bos.write(0)               // flags
      // syncsafe 28-bit size, 7 bits per byte
      bos.write((id3Body >> 21) & 0x7f); bos.write((id3Body >> 14) & 0x7f)
      bos.write((id3Body >> 7) & 0x7f); bos.write(id3Body & 0x7f)
      var i = 0
      while (i < id3Body) { bos.write((i * 31 + 7) % 256); i += 1 }
    }
    val sr = SampleRateHz(srIndex)
    frames.zipWithIndex.foreach { case ((brIdx, pad), j) =>
      val kbps = BitrateKbps(brIdx)
      val frameLen = 144000 * kbps / sr + pad
      bos.write(0xff)
      bos.write(0xfb) // sync low 3 bits, MPEG-1 (11), Layer III (01), no CRC (1)
      bos.write((brIdx << 4) | (srIndex << 2) | (pad << 1))
      bos.write((j % 4) << 6) // channel mode; rest zero
      var i = 4
      while (i < frameLen) { bos.write((i * 13 + j * 7) % 256); i += 1 }
    }
    bos.toByteArray
  }

  /** Walk the stream: skip one ID3v2 prefix if present, then hop
    * complete valid MPEG-1 Layer III frames until the first byte
    * that does not parse. Never scans for sync inside payloads —
    * hop-by-computed-length is what makes this metadata-cheap.
    */
  def parse(bytes: Array[Byte]): Mp3Meta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    var pos = 0
    var id3 = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3' &&
        u8(6) < 0x80 && u8(7) < 0x80 && u8(8) < 0x80 && u8(9) < 0x80) {
      val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      if (10L + size <= bytes.length) { id3 = 10 + size; pos = id3 }
    }
    var sampleRate = 0
    var nFrames = 0
    var sumKbps = 0L
    var nPadded = 0
    val seen = new java.util.HashSet[Int]()
    var ok = true
    while (ok && pos + 4 <= bytes.length) {
      val b1 = u8(pos); val b2 = u8(pos + 1); val b3 = u8(pos + 2)
      // sync (11 bits) + MPEG-1 + Layer III; CRC bit free
      if (b1 != 0xff || (b2 & 0xfe) != 0xfa) ok = false
      else {
        val brIdx = (b3 >> 4) & 0xf
        val srIdx = (b3 >> 2) & 0x3
        val pad = (b3 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
        else {
          val sr = SampleRateHz(srIdx)
          if (sampleRate == 0) sampleRate = sr
          if (sr != sampleRate) ok = false // mid-stream rate change: stop, report
          else {
            val kbps = BitrateKbps(brIdx)
            val frameLen = 144000 * kbps / sr + pad
            if (pos + frameLen > bytes.length) ok = false // truncated final frame
            else {
              nFrames += 1; sumKbps += kbps; nPadded += pad
              seen.add(brIdx)
              pos += frameLen
            }
          }
        }
      }
    }
    val durUs =
      if (sampleRate == 0) 0L
      else nFrames.toLong * SamplesPerFrame * 1000000L / sampleRate
    Mp3Meta(id3, sampleRate, nFrames, sumKbps, seen.size, nPadded, durUs,
      bytes.length - pos)
  }

  /** Dataset-level metadata extraction: one parser instance per
    * partition, map-only (zero shuffles) — the q177/q189 codec shape.
    */
  def mp3Features(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.id3Bytes, m.sampleRate, m.nFrames.toLong, m.sumBitrateKbps,
            m.nDistinctBitrates, m.nPadded.toLong, m.durationUs,
            m.trailingBytes.toLong)
        }
      }
      .toDF(idCol, "id3_bytes", "sample_rate", "n_frames", "sum_bitrate_kbps",
        "n_distinct_bitrates", "n_padded", "duration_us", "trailing_bytes")
  }
}
