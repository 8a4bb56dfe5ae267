package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real compressed-TEXT decode over opaque `binary` payload columns —
  * the text twin of the media codecs: web crawls, log archives, and
  * shard interchange all ship documents gzip-compressed (RFC 1952
  * framing around RFC 1951 DEFLATE — LZ77 + canonical Huffman), so
  * "scan the corpus" starts with an entropy-coded decode. The JDK's
  * zlib binding does the DEFLATE itself (exact by specification — a
  * lossless codec has ONE correct output), which gives the same
  * oracle leverage as the media fixtures: q194 compresses the
  * `documents` table's own text, decodes through this path, and gates
  * the features against SQL computed directly on the plain table.
  *
  * Untrusted-corpus discipline (the LIST-depth-cap theme): DEFLATE
  * ratios reach ~1000×, so a ~100 KB crafted payload can expand to
  * 100 MB and a chain of them can OOM an executor — decompression
  * output is therefore CAPPED (default 64 MiB per document) and a
  * payload that exceeds the cap is rejected as corrupt (None), never
  * silently truncated.
  */
object TextCodec {

  /** Default per-document decompressed-size cap: 64 MiB. */
  val MaxDecodedBytes: Int = 64 * 1024 * 1024

  /** gzip-compress UTF-8 text. Java's GZIPOutputStream writes MTIME=0
    * and a fixed default compression level, so the bytes are
    * deterministic for a given input — fixture-safe.
    */
  def gzipUtf8(text: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(text.getBytes("UTF-8"))
    gz.close()
    bos.toByteArray
  }

  /** Decompress a gzip payload to UTF-8 text. None for anything that
    * is not a complete, well-formed gzip stream — bad magic, CRC
    * mismatch, truncation — or whose decompressed size exceeds
    * `maxBytes` (a decompression bomb, not a document).
    */
  def gunzipUtf8(bytes: Array[Byte],
                 maxBytes: Int = MaxDecodedBytes): Option[String] =
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      var total = 0L
      while (n > 0) {
        total += n
        if (total > maxBytes) { in.close(); return None } // bomb, not a doc
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      Some(new String(out.toByteArray, "UTF-8"))
    } catch {
      case _: java.io.IOException => None // bad magic/CRC/truncation
    }

  /** Decode a gzip payload column to (idCol, decodable, text) — one
    * inflater pass per partition, map-only; undecodable payloads
    * surface as rows with a null text. Compose with the text operators
    * (tokens, fingerprints, quality) downstream exactly as if the
    * column had been stored plain.
    */
  def decodeTextPayloads(df: DataFrame, idCol: String, payloadCol: String,
                         maxBytes: Int = MaxDecodedBytes): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          gunzipUtf8(bytes, maxBytes) match {
            case Some(t) => (id, true, t)
            case None    => (id, false, null: String)
          }
        }
      }
      .toDF(idCol, "decodable", "text")
  }
}
