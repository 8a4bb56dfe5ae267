package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Avro Object Container File census — the remaining big data-lake
  * container next to parquet (q377), ORC-era warehouses' row format
  * of record: streaming ingest (Kafka → lake) lands as .avro long
  * before anything is columnarized, so a fleet triages OCF shards at
  * the header/block layer without decoding a single datum.
  *
  * Layout (Avro 1.11 spec §Object Container Files — entirely
  * closed-form, no schema resolution needed):
  *
  *   magic `Obj\x01` · file-metadata map · 16-byte sync marker ·
  *   blocks, each `record count (zigzag-varint long) · payload size
  *   (zigzag-varint long) · payload · 16-byte sync` — every block's
  *   sync must equal the header's.
  *
  * The metadata map is Avro-binary: repeated map segments of
  * `item count` (a NEGATIVE count means |count| items preceded by a
  * long byte size) then count × (string key · bytes value), closed by
  * a zero count. `avro.schema` and `avro.codec` are ordinary entries —
  * the census reports the schema length, the codec name, and the
  * entry count. Block payloads are deflate/snappy/zstd-compressed
  * record runs — the honest stub boundary (q366/q368 discipline):
  * counted and sized, never decoded.
  *
  * Stop-don't-guess: a wrong magic rejects the file whole; a
  * malformed metadata map rejects the header (fail-closed, zeroed
  * census); a block whose declared size overruns the buffer, a
  * negative count, or a sync mismatch HALTS the walk at that block's
  * start — blocks already walked stay counted and the remainder is
  * `trailing_bytes`. All bounds are overflow-proof subtraction forms
  * (declared sizes are attacker-controlled 64-bit zigzag values).
  */
object AvroOps {

  final case class AvroMeta(
      valid: Int,           // 1 iff header + every block + final position parse
      nMetaEntries: Int,
      schemaLen: Long,      // avro.schema value length (0 when absent)
      codec: String,        // avro.codec value, "null" when absent, "" when invalid
      nBlocks: Int,
      totalRecords: Long,
      payloadBytes: Long,   // Σ declared block payload sizes
      syncMismatch: Int,    // 1 iff the walk halted on a bad block sync
      trailingBytes: Long)

  private object Malformed extends Exception with scala.util.control.NoStackTrace

  private val Invalid = AvroMeta(0, 0, 0L, "", 0, 0L, 0L, 0, 0L)
  private val MaxMetaEntries = 10000

  private final class Reader(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw Malformed
      val v = b(pos) & 0xff; pos += 1; v
    }
    /** Avro long: zigzag varint, ≤10 bytes. */
    def avroLong(): Long = {
      var shift = 0; var out = 0L; var i = 0
      while (i < 10) {
        val v = u8()
        out |= (v & 0x7fL) << shift
        if ((v & 0x80) == 0) return (out >>> 1) ^ -(out & 1)
        shift += 7; i += 1
      }
      throw Malformed
    }
    def take(n: Long): Array[Byte] = {
      if (n < 0 || n > end - pos) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)
      pos += n.toInt; out
    }
  }

  def parse(bytes: Array[Byte]): AvroMeta = {
    val n = bytes.length
    if (n < 4 || bytes(0) != 'O' || bytes(1) != 'b' || bytes(2) != 'j' || bytes(3) != 1)
      return Invalid.copy(trailingBytes = n.toLong)
    try {
      val r = new Reader(bytes, 4, n)
      // file metadata map
      var nEntries = 0
      var schemaLen = 0L
      var codec = "null"
      var segCount = r.avroLong()
      while (segCount != 0L) {
        val items = if (segCount < 0L) { r.avroLong(); -segCount } else segCount
        if (items < 0 || items > MaxMetaEntries - nEntries) throw Malformed
        var i = 0L
        while (i < items) {
          val key = new String(r.take(r.avroLong()), "UTF-8")
          val valueLen = r.avroLong()
          if (key == "avro.codec") codec = new String(r.take(valueLen), "UTF-8")
          else {
            if (valueLen < 0 || valueLen > r.end - r.pos) throw Malformed
            if (key == "avro.schema") schemaLen = valueLen
            r.pos += valueLen.toInt
          }
          nEntries += 1
          i += 1
        }
        segCount = r.avroLong()
      }
      val sync = r.take(16L)
      // block walk: halting faults keep the walked prefix
      var nBlocks = 0
      var totalRecords = 0L
      var payloadBytes = 0L
      var syncMismatch = 0
      var halted = false
      while (!halted && r.pos < r.end) {
        val blockStart = r.pos
        try {
          val cnt = r.avroLong()
          val size = r.avroLong()
          if (cnt < 0 || size < 0 || size > r.end - r.pos) throw Malformed
          r.pos += size.toInt
          val blockSync = r.take(16L)
          if (!java.util.Arrays.equals(blockSync, sync)) {
            syncMismatch = 1
            r.pos = blockStart
            halted = true
          } else {
            // cnt is an attacker-controlled 64-bit zigzag (a few-byte
            // block can declare near-2^63 records — legal-shaped since
            // zero-field records are zero bytes, so no size-based cap
            // applies): accumulate with addExact and halt the walk as
            // malformed AT this block on overflow, instead of wrapping
            // the census total negative across two such blocks; the
            // add runs before nBlocks so the halted block counts in
            // neither total
            totalRecords = try Math.addExact(totalRecords, cnt) catch {
              case _: ArithmeticException => throw Malformed
            }
            nBlocks += 1
            payloadBytes += size
          }
        } catch {
          case Malformed =>
            r.pos = blockStart
            halted = true
        }
      }
      AvroMeta(if (halted) 0 else 1, nEntries, schemaLen, codec,
        nBlocks, totalRecords, payloadBytes, syncMismatch,
        (n - r.pos).toLong)
    } catch {
      // header (metadata map / header sync) failures reject the file
      // whole: nothing was reliably parsed, so the entire input is
      // unconsumed trailing — the same convention as the other walkers
      case Malformed => Invalid.copy(trailingBytes = n.toLong)
      case _: ArrayIndexOutOfBoundsException => Invalid.copy(trailingBytes = n.toLong)
    }
  }

  // ------------------------------------------------------------------
  // synthetic encoder (tests + the q378 oracle's closed-form replay)

  private def zz(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63)
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def bin(out: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    zz(out, b.length.toLong); out.write(b)
  }

  /** OCF with `extraMeta` entries beyond schema+codec, `blocks` of
    * (recordCount, payloadLen) with deterministic filler payloads, and
    * a sync marker derived from `syncSeed`.
    */
  def encodeSynthetic(schema: String, codec: String,
      extraMeta: Seq[(String, String)], blocks: Seq[(Long, Int)],
      syncSeed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    val entries = Seq("avro.schema" -> schema, "avro.codec" -> codec) ++ extraMeta
    zz(out, entries.size.toLong)
    entries.foreach { case (k, v) =>
      bin(out, k.getBytes("UTF-8")); bin(out, v.getBytes("UTF-8"))
    }
    zz(out, 0L)
    val sync = Array.tabulate(16)(i => ((syncSeed >> ((i % 8) * 8)) + i * 37).toByte)
    out.write(sync)
    blocks.foreach { case (cnt, len) =>
      zz(out, cnt); zz(out, len.toLong)
      out.write(Array.tabulate(len)(i => ((i * 29 + 11) & 0xff).toByte))
      out.write(sync)
    }
    out.toByteArray
  }

  /** Census DataFrame over (id, avro-bytes) — map-only, zero shuffles. */
  def avroFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.valid.toLong, m.nMetaEntries.toLong, m.schemaLen, m.codec,
            m.nBlocks.toLong, m.totalRecords, m.payloadBytes,
            m.syncMismatch.toLong, m.trailingBytes)
        }
      }
      .toDF(idCol, "valid", "n_meta_entries", "schema_len", "codec",
        "n_blocks", "total_records", "payload_bytes", "sync_mismatch",
        "trailing_bytes")
  }
}
