package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** TFRecord container walker — the training-shard member of the
  * container family (q323 WARC, q324 WebDataset tar, q332 ZIP): the
  * format TensorFlow datasets ship in, a concatenation of records
  * each framed as
  *
  *   length(8 LE) · masked_crc32c(length bytes)(4 LE) ·
  *   payload(length) · masked_crc32c(payload)(4 LE)
  *
  * The frame carries TWO checksums (CRC32C — Castagnoli poly,
  * reflected — then TFRecord's rotate-and-add mask), and both are
  * VERIFIED here: the length CRC guards the walk itself (a flipped
  * length byte would otherwise desynchronize every later record),
  * the payload CRC guards the data. Walking the framing gives the
  * census a training fleet triages shards on: record counts, payload
  * mass vs the fixed 16-byte/record frame overhead, and how much of
  * each shard is undecodable tail.
  *
  * Contract (stop-don't-guess, the container-walk family discipline):
  * a record needs 12 header bytes; its length CRC must verify; the
  * declared length must be non-negative and payload + trailing CRC
  * must fit in the remaining bytes; the payload CRC must verify. Any
  * violation stops the walk AT THAT RECORD'S START and the remainder
  * is `trailing_bytes` — `clean_eof` distinguishes a shard that ended
  * exactly on a record boundary from one with a corrupt or truncated
  * tail.
  */
object TfRecordOps {

  final case class TfMeta(
      nRecords: Int,
      sumPayloadBytes: Long,
      overheadBytes: Long, // 16 per accepted record
      trailingBytes: Long,
      cleanEof: Boolean)

  // CRC32C: reflected Castagnoli polynomial (0x82F63B78 reversed form)
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var j = 0
      while (j < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        j += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    while (i < off + len) {
      c = CrcTable((c ^ bytes(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  /** TFRecord's CRC mask: rotate right 15, add the magic constant. */
  def mask(crc: Int): Int =
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8.toInt)

  private def putIntLE(bos: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
    bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
  }

  private def putLongLE(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Deterministic shard from a payload-length plan; filler bytes are
    * a closed function of (record index, offset) so corruption tests
    * can flip a known byte.
    */
  def encodeSynthetic(payloadLens: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    payloadLens.zipWithIndex.foreach { case (len, j) =>
      val payload = Array.tabulate[Byte](len)(i => ((i * 29 + j * 13) % 256).toByte)
      val lenBytes = {
        val b = new java.io.ByteArrayOutputStream(); putLongLE(b, len.toLong)
        b.toByteArray
      }
      bos.write(lenBytes)
      putIntLE(bos, mask(crc32c(lenBytes, 0, 8)))
      bos.write(payload)
      putIntLE(bos, mask(crc32c(payload, 0, len)))
    }
    bos.toByteArray
  }

  def parse(bytes: Array[Byte]): TfMeta = {
    val n = bytes.length
    def readIntLE(i: Int): Int =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def readLongLE(i: Int): Long = {
      var v = 0L; var j = 7
      while (j >= 0) { v = (v << 8) | (bytes(i + j) & 0xffL); j -= 1 }
      v
    }
    var pos = 0
    var nRec = 0; var payloadSum = 0L
    var ok = true
    while (ok && pos < n) {
      if (pos + 12 > n) ok = false
      else {
        val len = readLongLE(pos)
        val lenCrcOk = readIntLE(pos + 8) == mask(crc32c(bytes, pos, 8))
        // `len > n - pos - 16`, NOT `pos + 12 + len + 4 > n`: a crafted
        // length near Long.MaxValue (its CRC is trivially computable)
        // would wrap the addition negative, slip past the check, and
        // index at the length's low 32 bits
        if (!lenCrcOk || len < 0 || len > n - pos - 16) ok = false
        else if (readIntLE(pos + 12 + len.toInt) !=
                 mask(crc32c(bytes, pos + 12, len.toInt))) ok = false
        else {
          nRec += 1; payloadSum += len
          pos += 12 + len.toInt + 4
        }
      }
    }
    TfMeta(nRec, payloadSum, 16L * nRec, (n - pos).toLong, pos == n)
  }

  def tfrecordFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.nRecords.toLong, m.sumPayloadBytes, m.overheadBytes,
            m.trailingBytes, if (m.cleanEof) 1L else 0L)
        }
      }
      .toDF(idCol, "n_records", "sum_payload_bytes", "overhead_bytes",
        "trailing_bytes", "clean_eof")
  }
}
