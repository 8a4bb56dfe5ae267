package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** ZIP archive walker — the remaining ubiquitous dataset container
  * ([[TarOps]] WebDataset shards, [[WarcOps]] crawl archives): public
  * datasets overwhelmingly arrive as .zip. The walk is the REAL
  * one — find the end-of-central-directory record by scanning
  * BACKWARD from EOF (its position is only known from the end; a
  * forward scan is wrong the moment any entry's payload contains the
  * signature bytes), then walk the central directory and CROSS-CHECK
  * each entry's local header (signature + name must match at the
  * recorded offset — central/local disagreement is the classic
  * zip-bomb/smuggling vector, counted rather than guessed through).
  *
  * Census: entry count, stored/deflated mix, compressed vs
  * uncompressed mass (the compression ratio doubles as a quality/dup
  * signal), central-directory overhead, local-mismatch count, and
  * undecodable tail. Entry CRCs are recorded over UNCOMPRESSED data,
  * so verifying them requires inflation — outside this walker's
  * honest boundary (the [[MultimodalStub]] discipline); what IS
  * checked is central↔local structural consistency.
  *
  * Contract (stop-don't-guess): no EOCD in the trailing 64 KiB + 22
  * ⇒ the whole input is trailing; a central entry with a bad
  * signature or overrunning the directory bounds stops the walk
  * there; local mismatches don't stop the walk (they're the signal).
  */
object ZipOps {

  final case class ZipMeta(
      eocdFound: Int,
      nEntries: Int,
      nStored: Int,
      nDeflated: Int,
      nOtherMethod: Int,
      sumCompBytes: Long,
      sumUncompBytes: Long,
      centralBytes: Long,    // central directory size per EOCD
      nLocalMismatch: Int,
      trailingBytes: Long)

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Deterministic archive from (name, method, compSize, uncompSize);
    * payload filler bytes include `PK` runs on purpose — discovery
    * must come from the EOCD, not signature scanning.
    */
  def encodeSynthetic(entries: Seq[(String, Int, Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >>> 8) & 0xff).toInt)
      bos.write(((v >>> 16) & 0xff).toInt); bos.write(((v >>> 24) & 0xff).toInt)
    }
    val offsets = new Array[Long](entries.length)
    entries.zipWithIndex.foreach { case ((name, method, csize, usize), j) =>
      offsets(j) = bos.size().toLong
      w32(0x04034b50L); w16(20); w16(0); w16(method); w16(0); w16(0)
      w32((j * 2654435761L) & 0xffffffffL) // deterministic fake CRC
      w32(csize.toLong); w32(usize.toLong)
      w16(name.length); w16(0)
      bos.write(name.getBytes(Ascii))
      var i = 0
      while (i < csize) { bos.write(if (i % 97 == 0) 'P' else if (i % 97 == 1) 'K' else (i * 11 + j * 3) % 256); i += 1 }
    }
    val cdStart = bos.size().toLong
    entries.zipWithIndex.foreach { case ((name, method, csize, usize), j) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(method); w16(0); w16(0)
      w32((j * 2654435761L) & 0xffffffffL)
      w32(csize.toLong); w32(usize.toLong)
      w16(name.length); w16(0); w16(0); w16(0); w16(0); w32(0)
      w32(offsets(j))
      bos.write(name.getBytes(Ascii))
    }
    val cdSize = bos.size().toLong - cdStart
    w32(0x06054b50L); w16(0); w16(0); w16(entries.length); w16(entries.length)
    w32(cdSize); w32(cdStart); w16(0)
    bos.toByteArray
  }

  def parse(bytes: Array[Byte]): ZipMeta = {
    val n = bytes.length
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    // EOCD: backward scan over the last 64 KiB + 22 (max comment)
    var eocd = -1
    var i = n - 22
    val stop = math.max(0, n - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (u32(i) == 0x06054b50L && i + 22 + u16(i + 20) == n) eocd = i
      else i -= 1
    }
    if (eocd < 0)
      return ZipMeta(0, 0, 0, 0, 0, 0L, 0L, 0L, 0, n.toLong)
    val nEntries = u16(eocd + 10)
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    var pos = cdOff
    val cdEnd = cdOff + cdSize
    var parsed = 0; var nStored = 0; var nDeflated = 0; var nOther = 0
    var comp = 0L; var uncomp = 0L; var mismatch = 0
    var ok = cdEnd <= eocd && cdOff >= 0
    while (ok && parsed < nEntries && pos + 46 <= cdEnd) {
      if (u32(pos.toInt) != 0x02014b50L) ok = false
      else {
        val p = pos.toInt
        val method = u16(p + 10)
        val csize = u32(p + 20)
        val usize = u32(p + 24)
        val nameLen = u16(p + 28)
        val extraLen = u16(p + 30)
        val commentLen = u16(p + 32)
        val localOff = u32(p + 42)
        if (pos + 46 + nameLen + extraLen + commentLen > cdEnd) ok = false
        else {
          val name = new String(bytes, p + 46, nameLen, Ascii)
          // cross-check the local header at the recorded offset
          val lo = localOff.toInt
          val localOk = localOff + 30 + nameLen <= cdOff &&
            u32(lo) == 0x04034b50L && u16(lo + 26) == nameLen &&
            new String(bytes, lo + 30, nameLen, Ascii) == name
          if (!localOk) mismatch += 1
          parsed += 1
          comp += csize
          uncomp += usize
          method match {
            case 0 => nStored += 1
            case 8 => nDeflated += 1
            case _ => nOther += 1
          }
          pos += 46 + nameLen + extraLen + commentLen
        }
      }
    }
    // trailing accounting, fail-closed: a CD pointer outside the file
    // (cdEnd > eocd) means NOTHING beyond the EOCD record was validated
    // — report the whole file unparsed rather than `n - cdOff`, which
    // goes NEGATIVE for an attacker cdOff > n (found by WalkerFuzzSpec:
    // a 0xFF window over the EOCD offset field). A mid-walk failure
    // has pos ∈ [cdOff, cdEnd] ⊆ [0, n], so n - pos is always sane.
    val trailing =
      if (ok && parsed == nEntries) 0L
      else if (cdEnd > eocd) n.toLong
      else n - pos
    ZipMeta(1, parsed, nStored, nDeflated, nOther, comp, uncomp, cdSize,
      mismatch, trailing)
  }

  /** Map-only dataset audit — the codec-family shape. */
  def zipFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.eocdFound.toLong, m.nEntries.toLong, m.nStored.toLong,
            m.nDeflated.toLong, m.nOtherMethod.toLong, m.sumCompBytes,
            m.sumUncompBytes, m.centralBytes, m.nLocalMismatch.toLong,
            m.trailingBytes)
        }
      }
      .toDF(idCol, "eocd_found", "n_entries", "n_stored", "n_deflated",
        "n_other_method", "sum_comp_bytes", "sum_uncomp_bytes", "central_bytes",
        "n_local_mismatch", "trailing_bytes")
  }
}
