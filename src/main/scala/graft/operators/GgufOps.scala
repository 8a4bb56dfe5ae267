package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** GGUF header walker — the quantized-weights sibling of q355's
  * SafeTensors audit: the container llama.cpp-family runtimes mmap,
  * framed (v3, all integers little-endian) as
  *
  *   magic "GGUF" · version(u32) · tensor_count(u64) · kv_count(u64) ·
  *   metadata KVs: key(u64 len + UTF-8) · value_type(u32) · value ·
  *   tensor infos: name(u64 len + UTF-8) · n_dims(u32) · dims(u64 ×
  *   n_dims) · ggml_type(u32) · offset(u64)
  *
  * The KV walk is TYPED — string (u64-length-prefixed), scalar widths
  * 1/2/4/8, and arrays (elem_type u32 + count u64 + payload) — so a
  * single wrong type id desynchronizes everything after it; the
  * walker therefore validates each type id against the v3 table and
  * stops at the first unknown one instead of guessing a width.
  *
  * Census: version, KV count/bytes by class (strings vs scalars vs
  * arrays), tensor count, parameter count (Π dims), and
  * stop-don't-guess `valid`/`trailing_bytes` for short, corrupt, or
  * truncated headers. (Tensor DATA offsets live outside the header
  * walk — this is the metadata triage a fleet runs before deciding
  * to mmap at all.)
  */
object GgufOps {

  final case class GgufMeta(
      valid: Int,
      version: Int,
      nKv: Int,
      nKvString: Int,
      nKvScalar: Int,
      nKvArray: Int,
      kvBytes: Long,
      nTensors: Int,
      paramCount: Long,
      headerBytes: Long,
      trailingBytes: Long)

  // v3 value types → fixed widths; 8 = string, 9 = array (variable)
  private val ScalarWidth = Map(0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 2L,
    4 -> 4L, 5 -> 4L, 6 -> 4L, 7 -> 1L, 10 -> 8L, 11 -> 8L, 12 -> 8L)

  /** Deterministic file from kv and tensor plans. KV values: Left =
    * string, Right = (type id, width) scalar zeros. Arrays are
    * emitted for type id 9 via `arrays` (elem type 4 = u32).
    */
  def encodeSynthetic(kvStrings: Seq[(String, String)],
                      kvScalars: Seq[(String, Int)],
                      kvArrays: Seq[(String, Int)],
                      tensors: Seq[(String, Seq[Long], Int)],
                      dropTail: Int = 0, badTypeAt: Int = -1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { var i = 0; while (i < 4) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def u64(v: Long): Unit = { var i = 0; while (i < 8) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def str(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u64(b.length.toLong); bos.write(b)
    }
    bos.write('G'); bos.write('G'); bos.write('U'); bos.write('F')
    u32(3L)
    u64(tensors.size.toLong)
    u64((kvStrings.size + kvScalars.size + kvArrays.size).toLong)
    var kvIdx = 0
    def typeId(t: Int): Long = if (kvIdx == badTypeAt) 99L else t.toLong
    kvStrings.foreach { case (k, v) =>
      str(k); u32(typeId(8)); kvIdx += 1; str(v)
    }
    kvScalars.foreach { case (k, t) =>
      str(k); u32(typeId(t)); kvIdx += 1
      (0L until ScalarWidth(t)).foreach(_ => bos.write(kvIdx % 256))
    }
    kvArrays.foreach { case (k, n) =>
      str(k); u32(typeId(9)); kvIdx += 1
      u32(4L); u64(n.toLong) // u32 elements
      (0 until n * 4).foreach(i => bos.write((i * 3 + 1) % 256))
    }
    tensors.foreach { case (name, dims, ggmlType) =>
      str(name); u32(dims.size.toLong); dims.foreach(u64)
      u32(ggmlType.toLong); u64(0L)
    }
    val out = bos.toByteArray
    if (dropTail > 0) out.dropRight(dropTail) else out
  }

  def parse(bytes: Array[Byte]): GgufMeta = {
    val n = bytes.length.toLong
    def fail(trailing: Long) =
      GgufMeta(0, 0, 0, 0, 0, 0, 0L, 0, 0L, 0L, trailing)
    if (n < 24 || bytes(0) != 'G' || bytes(1) != 'G' || bytes(2) != 'U' ||
      bytes(3) != 'F') return fail(n)
    var pos = 4L
    def u32(): Long = {
      var v = 0L; var i = 3
      while (i >= 0) { v = (v << 8) | (bytes((pos + i).toInt) & 0xffL); i -= 1 }
      pos += 4; v
    }
    def u64(): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (bytes((pos + i).toInt) & 0xffL); i -= 1 }
      pos += 8; v
    }
    val version = u32()
    val nTensors = u64()
    val nKv = u64()
    if (version != 3L || nTensors < 0 || nKv < 0) return fail(n - 4)
    var kvBytes = 0L; var nStr = 0; var nScal = 0; var nArr = 0
    var i = 0L
    var ok = true
    def readStr(): Boolean = {
      if (pos + 8 > n) { ok = false; false }
      else {
        val len = u64()
        // `len > n - pos`, NOT `pos + len > n`: a huge u64 length would
        // wrap the addition negative and desync every later read
        if (len < 0 || len > n - pos) { ok = false; false }
        else { pos += len; true }
      }
    }
    while (ok && i < nKv) {
      val start = pos
      if (readStr() && pos + 4 <= n) {
        val t = u32().toInt
        if (t == 8) { if (readStr()) nStr += 1 }
        else if (t == 9) {
          if (pos + 12 <= n) {
            val et = u32().toInt
            val cnt = u64()
            // divide instead of multiply: `cnt * width` overflows for a
            // huge element count and would pass as a 0-byte payload
            if (ScalarWidth.contains(et) && cnt >= 0 &&
              cnt <= (n - pos) / ScalarWidth(et)) {
              pos += cnt * ScalarWidth(et); nArr += 1
            } else ok = false
          } else ok = false
        } else if (ScalarWidth.contains(t) && pos + ScalarWidth(t) <= n) {
          pos += ScalarWidth(t); nScal += 1
        } else ok = false
      } else ok = false
      if (ok) kvBytes += pos - start
      else pos = start
      i += 1
    }
    if (!ok) return GgufMeta(0, version.toInt, (nStr + nScal + nArr),
      nStr, nScal, nArr, kvBytes, 0, 0L, pos, n - pos)
    var params = 0L
    var t = 0L
    while (ok && t < nTensors) {
      val start = pos
      if (readStr() && pos + 4 <= n) {
        val nd = u32()
        if (nd >= 0 && nd <= 8 && pos + nd * 8 + 12 <= n) {
          var p = 1L
          (0L until nd).foreach(_ => p *= u64())
          u32(); u64() // ggml type + offset
          params += p
        } else ok = false
      } else ok = false
      if (!ok) pos = start
      t += 1
    }
    if (!ok) GgufMeta(0, version.toInt, (nStr + nScal + nArr), nStr, nScal,
      nArr, kvBytes, t.toInt - 1, params, pos, n - pos)
    else GgufMeta(1, version.toInt, (nStr + nScal + nArr), nStr, nScal, nArr,
      kvBytes, nTensors.toInt, params, pos, n - pos)
  }

  def ggufFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.valid.toLong, m.version.toLong, m.nKv.toLong,
            m.nKvString.toLong, m.nKvScalar.toLong, m.nKvArray.toLong,
            m.kvBytes, m.nTensors.toLong, m.paramCount, m.headerBytes,
            m.trailingBytes)
        }
      }
      .toDF(idCol, "valid", "version", "n_kv", "n_kv_string", "n_kv_scalar",
        "n_kv_array", "kv_bytes", "n_tensors", "param_count", "header_bytes",
        "trailing_bytes")
  }
}
