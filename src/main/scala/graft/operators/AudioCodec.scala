package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real audio decode over opaque `binary` payload columns — the audio
  * half of the codec step [[MultimodalStub]] stubs out, made real for
  * the one audio container that needs no codec at all: RIFF/WAVE
  * carrying 16-bit PCM (WAV format tag 1). PCM samples are stored
  * literally, so a correct chunk-walk of the container IS the decode —
  * zero new dependencies, byte-exact, and therefore arithmetically
  * replayable by an external oracle (q177/q178), unlike lossy codecs
  * (MP3/AAC stay honestly stubbed).
  *
  * Spark-side shape mirrors [[MultimodalCodec]]: binary in → typed
  * integer features out, one parser pass per partition, map-only — on
  * a 100 TB media corpus each executor decodes its own partition's
  * payloads and only the tiny feature rows ever shuffle.
  *
  * All downstream math is integer-exact: sum/peak of |sample|, sign
  * changes counted as `s_i·s_{i−1} < 0`, and the 64-bucket envelope
  * hash compares `e_b·64 > Σe` (no floating-point mean) — which makes
  * the hash exactly invariant under uniform integer gain (g·e_b·64 >
  * g·Σe ⇔ e_b·64 > Σe for g > 0), the property the audio near-dup
  * grouping in q178 relies on, the 1-D twin of aHash's brightness
  * invariance.
  */
object AudioCodec {

  /** Encode interleaved 16-bit signed PCM as canonical RIFF/WAVE bytes
    * (44-byte header + little-endian samples). Also the test-fixture
    * generator: specs and the q177/q178 fixtures synthesize
    * deterministic waveforms and round-trip them through the real
    * container format.
    */
  def encodePcmWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    val dataLen = samples.length * 2
    val bos = new ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff); bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels * 2) // byte rate
    le16(channels * 2)              // block align
    le16(16)                        // bits per sample
    ascii("data"); le32(dataLen)
    var i = 0
    while (i < samples.length) { le16(samples(i) & 0xffff); i += 1 }
    bos.toByteArray
  }

  /** Decode RIFF/WAVE bytes to (sampleRate, channels, interleaved
    * 16-bit samples). A real chunk-walk, not a fixed-offset read:
    * skips unknown chunks (LIST/INFO metadata commonly precedes data),
    * honors RIFF's odd-size pad byte, and requires an explicit 16-bit
    * PCM `fmt ` chunk before `data`. Truncated, non-WAV, compressed,
    * or non-16-bit payloads → None (surfaced as rows, not exceptions).
    */
  def decodePcmWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(j => bytes(i + j) == s.charAt(j).toByte)
    if (bytes.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var ok = false
    while (pos + 8 <= bytes.length) {
      val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (tag(pos, "fmt ")) {
        if (size < 16) return None
        val fmt = le16(pos + 8)
        channels = le16(pos + 10)
        sampleRate = le32(pos + 12)
        val bits = le16(pos + 22)
        if (fmt != 1 || bits != 16 || channels < 1) return None
        ok = true
      } else if (tag(pos, "data")) {
        if (!ok) return None // fmt must precede data
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(pos + 8 + 2 * i).toShort; i += 1 }
        return Some((sampleRate, channels, out))
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned: odd sizes carry a pad byte
    }
    None
  }

  /** Nearest-neighbor resample: output index `i` samples source
    * `(i·n)/outN` — integer floor division, the 1-D twin of
    * [[MultimodalCodec.resizeNearest]], replayed verbatim by oracles.
    */
  def resampleNearest(samples: Array[Short], outN: Int): Array[Short] = {
    val n = samples.length
    require(n > 0 || outN == 0, "cannot resample an empty clip to a nonzero length")
    val out = new Array[Short](outN)
    var i = 0
    while (i < outN) { out(i) = samples(i * n / outN); i += 1 }
    out
  }

  /** 64-bucket energy-envelope hash: sample `j` of `n` falls in bucket
    * `(j·64)/n` (integer division — every bucket nonempty when n ≥ 64),
    * bucket energy is the exact Σ|sample|, and bit b (MSB-first) is set
    * iff `e_b·64 > Σe`. Integer-exact, so invariant under uniform
    * positive gain — clips that differ only in volume hash identically,
    * the buckets q178 groups on.
    */
  def envelopeHash64(samples: Array[Short]): Long = {
    val n = samples.length
    val e = new Array[Long](64)
    var j = 0
    while (j < n) { e((j.toLong * 64 / n).toInt) += math.abs(samples(j).toLong); j += 1 }
    var total = 0L
    var b = 0
    while (b < 64) { total += e(b); b += 1 }
    var hash = 0L
    b = 0
    while (b < 64) {
      if (e(b) * 64 > total) hash |= 1L << (63 - b)
      b += 1
    }
    hash
  }

  /** Decode a payload column to audio features: (idCol, decodable,
    * sample_rate, n_samples, sum_abs, peak_abs, zero_crossings,
    * envelope_hex). `sum_abs`/`peak_abs` are exact integer magnitude
    * stats; `zero_crossings` counts strict sign changes
    * (`s_i·s_{i−1} < 0`, zeros break runs crossing-free);
    * `envelope_hex` is [[envelopeHash64]] as 16 lowercase hex chars
    * (`%016x`, matching the image aHash formatting). One parser pass
    * per partition, map-only; undecodable payloads surface as rows.
    */
  def decodeAudioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcmWav(bytes) match {
            case Some((sr, _, s)) =>
              var sumAbs = 0L
              var peak = 0L
              var zc = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i).toLong
                val a = math.abs(v)
                sumAbs += a
                if (a > peak) peak = a
                if (i > 0 && v * s(i - 1) < 0) zc += 1
                i += 1
              }
              (id, true, sr, s.length.toLong, sumAbs, peak, zc, f"${envelopeHash64(s)}%016x")
            case None => (id, false, 0, 0L, 0L, 0L, 0L, null: String)
          }
        }
      }
      .toDF(idCol, "decodable", "sample_rate", "n_samples", "sum_abs", "peak_abs",
        "zero_crossings", "envelope_hex")
  }
}
