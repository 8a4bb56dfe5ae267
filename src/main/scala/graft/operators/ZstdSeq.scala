package graft.operators

/** Zstandard compressed-block DECODER for the default-tables case —
  * the one member of the compression family (gzip/snappy/LZ4 all
  * fully decode-verified) that q366/q368 could only walk structurally.
  * RFC 8878: a compressed block = literals section + sequences
  * section; this decoder handles
  *
  *   - literals: Raw and RLE forms (no entropy coding);
  *   - sequences: Predefined_Mode (the RFC's default FSE
  *     distributions for literal-length / offset / match-length
  *     codes, decoding tables BUILT here from the normalized counts
  *     via the spec's spread algorithm) and RLE_Mode;
  *   - the backward bitstream, interleaved state updates, and the
  *     three-slot repeat-offset history with its literals-length-0
  *     shift.
  *
  * Huffman literals (Compressed/Treeless) and FSE_Compressed /
  * Repeat sequence modes return None — the honest stub boundary,
  * reported by the census as `unsupported`, never guessed at. Real
  * zstd CLI output at level 1 on repetitive input uses exactly the
  * supported forms (raw literals + predefined sequences), and
  * ZstdSeqSpec pins four such REAL frames byte-for-byte, verified
  * against both the original content and the frame's XXH64 checksum.
  *
  * Bomb discipline: the caller passes `maxOut`; decoded output and
  * every declared length is bounded against it BEFORE allocation
  * grows (the gzip/LZ4 rule).
  */
object ZstdSeq {

  // ------------------------------------------------------------------
  // FSE decoding table (RFC 8878 §4.1)

  final case class FseTable(accuracyLog: Int, symbol: Array[Int],
                            numBits: Array[Int], baseline: Array[Int])

  /** Build the decoding table from normalized counts (-1 = the
    * "less than 1" probability: one cell at the table's END, full
    * accuracyLog-bit state reload).
    */
  def buildFse(norm: Array[Int], accuracyLog: Int): FseTable = {
    val tableSize = 1 << accuracyLog
    val cells = new Array[Int](tableSize)
    val symbolNext = new Array[Int](norm.length)
    var highThreshold = tableSize - 1
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) {
        cells(highThreshold) = s; highThreshold -= 1
        symbolNext(s) = 1
      } else symbolNext(s) = norm(s)
      s += 1
    }
    val step = (tableSize >> 1) + (tableSize >> 3) + 3
    val mask = tableSize - 1
    var pos = 0
    s = 0
    while (s < norm.length) {
      var i = 0
      while (i < norm(s)) { // skips -1 and 0 counts
        cells(pos) = s
        do { pos = (pos + step) & mask } while (pos > highThreshold)
        i += 1
      }
      s += 1
    }
    require(pos == 0, s"FSE spread did not close (pos=$pos)")
    val symbol = new Array[Int](tableSize)
    val numBits = new Array[Int](tableSize)
    val baseline = new Array[Int](tableSize)
    var u = 0
    while (u < tableSize) {
      val sym = cells(u)
      val nextState = symbolNext(sym); symbolNext(sym) += 1
      val nb = accuracyLog - (31 - Integer.numberOfLeadingZeros(nextState))
      symbol(u) = sym
      numBits(u) = nb
      baseline(u) = (nextState << nb) - tableSize
      u += 1
    }
    FseTable(accuracyLog, symbol, numBits, baseline)
  }

  // Predefined distributions (RFC 8878 §3.1.1.3.2.2.1)
  val LLDefaultNorm: Array[Int] = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  val MLDefaultNorm: Array[Int] = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1)
  val OFDefaultNorm: Array[Int] = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  lazy val LLDefault: FseTable = buildFse(LLDefaultNorm, 6)
  lazy val MLDefault: FseTable = buildFse(MLDefaultNorm, 6)
  lazy val OFDefault: FseTable = buildFse(OFDefaultNorm, 5)

  // code → (baseline, extra bits) (RFC 8878 §3.1.1.3.2.1.1)
  private val LLBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MLBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ------------------------------------------------------------------
  // backward bitstream (RFC 8878 §4.1.1): written forward, read
  // backward from a 1-bit end marker in the last byte

  private final class BackBits(bytes: Array[Byte], start: Int, end: Int) {
    // number of readable bits below the marker; -1 = invalid stream
    var bitPos: Int = {
      if (end <= start) -1
      else {
        val last = bytes(end - 1) & 0xff
        if (last == 0) -1 // no marker: corrupt
        else (end - 1 - start) * 8 + (31 - Integer.numberOfLeadingZeros(last))
      }
    }
    def ok: Boolean = bitPos >= 0
    /** Read `n` bits moving DOWNWARD; bits assemble little-endian. */
    def read(n: Int): Int = {
      if (n == 0) return 0
      bitPos -= n
      if (bitPos < 0) return 0 // caller checks ok via bitPos
      var v = 0
      var i = 0
      while (i < n) {
        val b = bitPos + i
        val bit = (bytes(start + (b >> 3)) >> (b & 7)) & 1
        v |= bit << i
        i += 1
      }
      v
    }
  }

  // per-stream decoder state: a real FSE table or an RLE pin
  private final class StreamState(val table: FseTable, val rleSymbol: Int) {
    var state = 0
    def isRle: Boolean = table == null
    def init(br: BackBits): Unit = if (!isRle) state = br.read(table.accuracyLog)
    def sym: Int = if (isRle) rleSymbol else table.symbol(state)
    def update(br: BackBits): Unit = if (!isRle)
      state = table.baseline(state) + br.read(table.numBits(state))
  }

  // ------------------------------------------------------------------

  /** Decode one COMPRESSED block's content. `None` = the block uses a
    * form outside the supported boundary (Huffman literals,
    * FSE_Compressed/Repeat sequence modes) or is malformed — the
    * caller distinguishes via [[probe]].
    */
  def decodeBlock(bytes: Array[Byte], off: Int, end: Int,
                  maxOut: Int): Option[Array[Byte]] = {
    if (end - off < 1) return None
    val b0 = bytes(off) & 0xff
    val litType = b0 & 3
    if (litType >= 2) return None // Huffman / treeless: honest stub
    // Raw/RLE size forms: bit2 clear -> 1-byte header, 5-bit size;
    // sf=01 -> 2 bytes, 12 bits; sf=11 -> 3 bytes, 20 bits
    val (litHdrLen, regen) =
      if ((b0 & 4) == 0) (1, b0 >> 3)
      else if ((b0 & 8) == 0) {
        if (end - off < 2) return None
        (2, ((b0 | ((bytes(off + 1) & 0xff) << 8)) >> 4))
      } else {
        if (end - off < 3) return None
        (3, ((b0 | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16)) >> 4))
      }
    if (regen > maxOut) return None
    var p = off + litHdrLen
    val lit: Array[Byte] =
      if (litType == 0) {
        if (regen > end - p) return None
        val a = java.util.Arrays.copyOfRange(bytes, p, p + regen)
        p += regen
        a
      } else { // RLE
        if (p >= end) return None
        val a = new Array[Byte](regen)
        java.util.Arrays.fill(a, bytes(p))
        p += 1
        a
      }
    // sequences section header
    if (p >= end) return None
    val s0 = bytes(p) & 0xff
    var nbSeq = 0
    if (s0 < 128) { nbSeq = s0; p += 1 }
    else if (s0 < 255) {
      if (end - p < 2) return None
      nbSeq = ((s0 - 128) << 8) + (bytes(p + 1) & 0xff); p += 2
    } else {
      if (end - p < 3) return None
      nbSeq = (bytes(p + 1) & 0xff) + ((bytes(p + 2) & 0xff) << 8) + 0x7F00
      p += 3
    }
    if (nbSeq == 0)
      return if (p == end) Some(lit) else None
    if (p >= end) return None
    val modes = bytes(p) & 0xff
    p += 1
    if ((modes & 3) != 0) return None // reserved bits must be zero
    def mkStream(mode: Int, table: FseTable, maxSym: Int): Option[StreamState] =
      mode match {
        case 0 => Some(new StreamState(table, -1))
        case 1 =>
          if (p >= end) None
          else {
            val sym = bytes(p) & 0xff; p += 1
            if (sym > maxSym) None else Some(new StreamState(null, sym))
          }
        case _ => None // FSE_Compressed / Repeat: honest stub
      }
    // header order in the byte stream: LL, OF, ML
    val llOpt = mkStream((modes >> 6) & 3, LLDefault, 35)
    val ofOpt = mkStream((modes >> 4) & 3, OFDefault, 31)
    val mlOpt = mkStream((modes >> 2) & 3, MLDefault, 52)
    if (llOpt.isEmpty || ofOpt.isEmpty || mlOpt.isEmpty) return None
    val (llS, ofS, mlS) = (llOpt.get, ofOpt.get, mlOpt.get)
    val br = new BackBits(bytes, p, end)
    if (!br.ok) return None
    // initial states: LL, then OF, then ML
    llS.init(br); ofS.init(br); mlS.init(br)
    if (br.bitPos < 0) return None
    var buf = new Array[Byte](math.min(maxOut, 1 << 16))
    var o = 0
    def ensure(n: Int): Boolean = {
      if (o + n > maxOut) false
      else {
        if (o + n > buf.length)
          buf = java.util.Arrays.copyOf(buf,
            math.min(maxOut, math.max(buf.length * 2, o + n)))
        true
      }
    }
    var litPos = 0
    var rep1 = 1L; var rep2 = 4L; var rep3 = 8L
    var i = 0
    while (i < nbSeq) {
      val ofCode = ofS.sym
      if (ofCode > 30) return None
      val offsetValue = (1L << ofCode) + (
        // offset codes can exceed 24 bits: read in two pulls to stay
        // inside the Int-sized reader
        if (ofCode <= 16) br.read(ofCode).toLong
        else {
          val hi = br.read(ofCode - 16).toLong
          (hi << 16) | (br.read(16).toLong & 0xffff)
        })
      val mlCode = mlS.sym
      if (mlCode > 52) return None
      val ml = MLBase(mlCode) + br.read(MLBits(mlCode))
      val llCode = llS.sym
      if (llCode > 35) return None
      val ll = LLBase(llCode) + br.read(LLBits(llCode))
      if (br.bitPos < 0) return None
      // repeat-offset resolution (RFC 8878 §3.1.1.5)
      val offset: Long =
        if (offsetValue > 3) {
          val x = offsetValue - 3
          rep3 = rep2; rep2 = rep1; rep1 = x
          x
        } else {
          val v = if (ll == 0) offsetValue + 1 else offsetValue
          v match {
            case 1 => rep1
            case 2 => val x = rep2; rep2 = rep1; rep1 = x; x
            case 3 => val x = rep3; rep3 = rep2; rep2 = rep1; rep1 = x; x
            case _ => // 4: rep1 - 1 (ll == 0, offsetValue == 3)
              val x = rep1 - 1
              if (x <= 0) return None
              rep3 = rep2; rep2 = rep1; rep1 = x
              x
          }
        }
      // state updates BEFORE executing, skipped after the last
      // sequence; order: LL, ML, OF
      if (i != nbSeq - 1) {
        llS.update(br); mlS.update(br); ofS.update(br)
        if (br.bitPos < 0) return None
      }
      // execute: literals copy, then match copy
      if (litPos + ll > lit.length || !ensure(ll + ml)) return None
      System.arraycopy(lit, litPos, buf, o, ll)
      litPos += ll; o += ll
      if (offset > o || ml < 3) return None
      val src = (o - offset).toInt
      var j = 0
      while (j < ml) { buf(o + j) = buf(src + j); j += 1 }
      o += ml
      i += 1
    }
    // the bitstream must be consumed EXACTLY, and the remaining
    // literals flush to the output
    if (br.bitPos != 0) return None
    val rest = lit.length - litPos
    if (!ensure(rest)) return None
    System.arraycopy(lit, litPos, buf, o, rest)
    o += rest
    Some(java.util.Arrays.copyOf(buf, o))
  }

  /** Is this compressed block OUTSIDE the supported boundary by
    * DECLARATION (Huffman literals, FSE_Compressed/Repeat modes) —
    * as opposed to malformed? The census reports the two separately:
    * `unsupported` is a stub boundary, `failed` is a defect.
    */
  def isUnsupported(bytes: Array[Byte], off: Int, end: Int): Boolean = {
    if (end - off < 1) return false
    val b0 = bytes(off) & 0xff
    if ((b0 & 3) >= 2) return true // Huffman / treeless literals
    // walk past literals to the modes byte
    val (hdrLen, regen) =
      if ((b0 & 4) == 0) (1, b0 >> 3)
      else if ((b0 & 8) == 0) {
        if (end - off < 2) return false
        (2, (b0 | ((bytes(off + 1) & 0xff) << 8)) >> 4)
      } else {
        if (end - off < 3) return false
        (3, (b0 | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16)) >> 4)
      }
    var p = off + hdrLen + (if ((b0 & 3) == 0) regen else 1)
    if (p >= end) return false
    val s0 = bytes(p) & 0xff
    p += (if (s0 < 128) 1 else if (s0 < 255) 2 else 3)
    if (s0 == 0 || p >= end) return false
    val modes = bytes(p) & 0xff
    ((modes >> 6) & 3) >= 2 || ((modes >> 4) & 3) >= 2 || ((modes >> 2) & 3) >= 2
  }

  // ------------------------------------------------------------------
  // frame-level decode census

  final case class SeqCensus(valid: Int, nBlocks: Int, nRaw: Int, nRle: Int,
                             nCompressed: Int, nDecoded: Int, nUnsupported: Int,
                             nFailed: Int, decodedBytes: Long, contentOk: Int)

  private val InvalidCensus = SeqCensus(0, 0, 0, 0, 0, 0, 0, 0, 0L, -1)

  /** Walk ONE zstd frame and decode every block it can: raw and RLE
    * blocks directly, compressed blocks through [[decodeBlock]].
    * When the frame carries a content checksum AND every block
    * decoded, `contentOk` verifies XXH64-low32 over the decoded
    * stream (1/0); otherwise -1. Single-frame census — the fixture
    * and synthetic shapes; a declared-unsupported block never counts
    * as failed.
    */
  def frameSeqCensus(bytes: Array[Byte], maxOut: Int = 1 << 22): SeqCensus = {
    val n = bytes.length
    def le32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    if (n < 6 || le32(0) != 0xFD2FB528L) return InvalidCensus
    val fhd = bytes(4) & 0xff
    if ((fhd & 3) != 0) return InvalidCensus // dictionary id: out of scope
    val single = (fhd & 0x20) != 0
    val hasChecksum = (fhd & 0x04) != 0
    val fcsLen = (fhd >> 6) match {
      case 0 => if (single) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    var pos = 5 + (if (single) 0 else 1) + fcsLen
    if (pos > n) return InvalidCensus
    var nBlocks = 0; var nRaw = 0; var nRle = 0; var nComp = 0
    var nDec = 0; var nUnsup = 0; var nFail = 0
    var decodedBytes = 0L
    val content = new java.io.ByteArrayOutputStream()
    var tracked = true
    var last = false
    while (!last) {
      if (n - pos < 3) return InvalidCensus
      val h = (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
        ((bytes(pos + 2) & 0xffL) << 16)
      pos += 3
      last = (h & 1) != 0
      val tpe = ((h >> 1) & 3).toInt
      val size = (h >> 3).toInt
      nBlocks += 1
      tpe match {
        case 0 => // raw
          if (size > n - pos) return InvalidCensus
          nRaw += 1
          decodedBytes += size
          if (tracked && content.size() + size <= maxOut)
            content.write(bytes, pos, size)
          else tracked = false
          pos += size
        case 1 => // RLE: size field = regenerated length, payload 1 byte
          if (pos >= n || size > maxOut) return InvalidCensus
          nRle += 1
          decodedBytes += size
          if (tracked && content.size() + size <= maxOut) {
            var i = 0
            while (i < size) { content.write(bytes(pos)); i += 1 }
          } else tracked = false
          pos += 1
        case 2 =>
          if (size > n - pos) return InvalidCensus
          nComp += 1
          decodeBlock(bytes, pos, pos + size, maxOut) match {
            case Some(dec) =>
              nDec += 1
              decodedBytes += dec.length
              if (tracked && content.size() + dec.length <= maxOut)
                content.write(dec, 0, dec.length)
              else tracked = false
            case None =>
              if (isUnsupported(bytes, pos, pos + size)) nUnsup += 1
              else nFail += 1
              tracked = false
          }
          pos += size
        case _ => return InvalidCensus // reserved
      }
    }
    var contentOk = -1
    if (hasChecksum) {
      if (n - pos < 4) return InvalidCensus
      if (tracked && nUnsup == 0 && nFail == 0)
        contentOk = if (ZstdOps.xxh64Low32(content.toByteArray) == le32(pos)) 1 else 0
      pos += 4
    }
    SeqCensus(if (pos == n) 1 else 0, nBlocks, nRaw, nRle, nComp,
      nDec, nUnsup, nFail, decodedBytes, contentOk)
  }

  /** Map-only dataset census over (id, frame bytes) — the decode layer
    * q366/q368's structural walk could not reach.
    */
  def zstdSeqFeatures(df: org.apache.spark.sql.DataFrame, idCol: String,
                      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val c = frameSeqCensus(bytes)
          (id, c.valid.toLong, c.nBlocks.toLong, c.nRaw.toLong, c.nRle.toLong,
            c.nCompressed.toLong, c.nDecoded.toLong, c.nUnsupported.toLong,
            c.nFailed.toLong, c.decodedBytes, c.contentOk.toLong)
        }
      }
      .toDF(idCol, "valid", "n_blocks", "n_raw", "n_rle", "n_compressed",
        "n_decoded", "n_unsupported", "n_failed", "decoded_bytes", "content_ok")
  }
}
