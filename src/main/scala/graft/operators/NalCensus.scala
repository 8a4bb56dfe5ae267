package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** H.264/AVC Annex-B NAL-unit census — video triage without entropy
  * decode, the video member of the header-walk family ([[MpegAudio]]
  * audio, q314/q315): an Annex-B elementary stream is a sequence of
  * start codes (`00 00 01` or `00 00 00 01`) each followed by one NAL
  * unit whose first byte is a fixed header (forbidden-zero bit,
  * 2-bit nal_ref_idc, 5-bit nal_unit_type). Walking start codes gives
  * the structural census a 100 TB video corpus triages on — parameter
  * sets present? how many IDR random-access points? slice/SEI mix?
  * mean NAL size — all without touching CABAC/CAVLC payload bits
  * (the honest [[MultimodalStub]] boundary).
  *
  * Contract: a stream must BEGIN with a start code (leading garbage ⇒
  * everything is trailing); a NAL with the forbidden bit set stops
  * the walk at its start code (stop-don't-guess); NAL payloads end at
  * the next start code or EOF. Payload bytes are never interpreted —
  * real encoders emulation-prevent `00 00 01` inside payloads, so
  * start-code scanning IS the framing.
  */
object NalCensus {

  final case class NalMeta(
      nNals: Int,
      nIdr: Int,       // type 5
      nSlice: Int,     // type 1 (non-IDR slice)
      nSps: Int,       // type 7
      nPps: Int,       // type 8
      nSei: Int,       // type 6
      nOther: Int,
      n4ByteStarts: Int,
      sumNalBytes: Long, // NAL unit bytes (headers + payloads, excl. start codes)
      trailingBytes: Int)

  /** Deterministic Annex-B stream: per (type, payloadLen, long start
    * code) plan; payload filler bytes are non-zero so no accidental
    * start codes arise (the emulation-prevention property, by
    * construction).
    */
  def encodeSynthetic(plan: Seq[(Int, Int, Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    plan.zipWithIndex.foreach { case ((nalType, payloadLen, long4), j) =>
      if (long4) bos.write(0)
      bos.write(0); bos.write(0); bos.write(1)
      bos.write((3 << 5) | (nalType & 0x1f)) // ref_idc 3, forbidden 0
      var i = 0
      while (i < payloadLen) { bos.write((i * 7 + j * 3) % 255 + 1); i += 1 }
    }
    bos.toByteArray
  }

  def parse(bytes: Array[Byte]): NalMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def startCodeLen(i: Int): Int =
      if (i + 3 <= bytes.length && u8(i) == 0 && u8(i + 1) == 0 && u8(i + 2) == 1) 3
      else if (i + 4 <= bytes.length && u8(i) == 0 && u8(i + 1) == 0 &&
        u8(i + 2) == 0 && u8(i + 3) == 1) 4
      else 0
    var pos = 0
    var nNals = 0; var nIdr = 0; var nSlice = 0; var nSps = 0; var nPps = 0
    var nSei = 0; var nOther = 0; var n4 = 0; var sumBytes = 0L
    var ok = true
    while (ok && pos < bytes.length) {
      val sc = startCodeLen(pos)
      if (sc == 0) ok = false
      else {
        val nalStart = pos + sc
        if (nalStart >= bytes.length || (u8(nalStart) & 0x80) != 0) ok = false
        else {
          // find next start code (or EOF) — scan for 00 00 01 / 00 00 00 01
          var e = nalStart
          var found = -1
          while (found < 0 && e + 3 <= bytes.length) {
            if (u8(e) == 0 && u8(e + 1) == 0 &&
              (u8(e + 2) == 1 || (u8(e + 2) == 0 && e + 4 <= bytes.length && u8(e + 3) == 1)))
              found = e
            else e += 1
          }
          val nalEnd = if (found >= 0) found else bytes.length
          val t = u8(nalStart) & 0x1f
          nNals += 1
          sumBytes += nalEnd - nalStart
          if (sc == 4) n4 += 1
          t match {
            case 5 => nIdr += 1
            case 1 => nSlice += 1
            case 7 => nSps += 1
            case 8 => nPps += 1
            case 6 => nSei += 1
            case _ => nOther += 1
          }
          pos = nalEnd
        }
      }
    }
    NalMeta(nNals, nIdr, nSlice, nSps, nPps, nSei, nOther, n4, sumBytes,
      bytes.length - pos)
  }

  /** Map-only dataset census — the codec-family shape. */
  def nalFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = parse(bytes)
          (id, m.nNals.toLong, m.nIdr.toLong, m.nSlice.toLong, m.nSps.toLong,
            m.nPps.toLong, m.nSei.toLong, m.nOther.toLong, m.n4ByteStarts.toLong,
            m.sumNalBytes, m.trailingBytes.toLong)
        }
      }
      .toDF(idCol, "n_nals", "n_idr", "n_slice", "n_sps", "n_pps", "n_sei",
        "n_other", "n_4byte_starts", "sum_nal_bytes", "trailing_bytes")
  }
}
