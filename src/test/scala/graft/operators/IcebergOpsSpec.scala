package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg manifest walker: Avro record-body decode round-trips
  * (unions, nested records, bounds arrays incl. the negative-count
  * block form), the schema/codec contract, exact-consumption block
  * honesty, and the framing halts shared with the OCF walk.
  */
class IcebergOpsSpec extends AnyFunSuite {

  import IcebergOps._

  private val e0 = Entry(1, Some(42L), "a.parquet", "PARQUET", 0, 100L, 4096L,
    Some(Bounds(-17L, 250L)))
  private val e1 = Entry(0, None, "b.parquet", "PARQUET", 2, 7L, 512L, None)
  private val e2 = Entry(2, Some(-3L), "c.parquet", "AVRO", 1, 9L, 64L,
    Some(Bounds(Long.MinValue, Long.MaxValue)))

  test("entry round-trip: unions, nested partition, 8-byte-LE bounds, negative longs") {
    val m = parseManifest(encodeManifest(Seq(Seq(e0, e1, e2)), syncSeed = 7L))
    assert(m.valid == 1 && m.schemaOk == 1 && m.nBlocks == 1 &&
      m.nMalformedBlocks == 0 && m.trailingBytes == 0L)
    assert(m.entries == Seq(e0, e1, e2), m.entries.toString)
  }

  test("multi-block manifests concatenate entries in order") {
    val m = parseManifest(encodeManifest(Seq(Seq(e0), Seq(e1, e2)), syncSeed = 9L))
    assert(m.nBlocks == 2 && m.entries == Seq(e0, e1, e2))
  }

  test("schema drift: census zeroed, blocks still framed (stop-don't-guess)") {
    val m = parseManifest(encodeManifest(Seq(Seq(e0, e1)), syncSeed = 3L,
      schema = SchemaJson.replace("manifest_entry", "someone_elses_record")))
    assert(m.valid == 1 && m.schemaOk == 0)
    assert(m.nBlocks == 1 && m.entries.isEmpty && m.nMalformedBlocks == 0,
      "no decode may be attempted against an unknown schema")
  }

  test("a block that does not decode to EXACT consumption is malformed, others survive") {
    val good = encodeManifest(Seq(Seq(e0)), syncSeed = 5L, garbageTail = true)
    val m = parseManifest(good)
    assert(m.valid == 1, "framing stays authoritative")
    assert(m.nBlocks == 2 && m.nMalformedBlocks == 1)
    assert(m.entries == Seq(e0), "the garbage block contributes nothing")
    // under-consumption is malformed too: declare 1 entry, ship 2
    val two = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(encodeEntry(e0)); out.write(encodeEntry(e1))
      out.toByteArray
    }
    val hdr = encodeManifest(Seq(Seq.empty), syncSeed = 5L)
    // splice: count=1, len=two.length — build by hand via the encoder's
    // framing (block of e0+e1 declared as ONE entry)
    val spliced = {
      val base = encodeManifest(Seq(Seq(e0, e1)), syncSeed = 5L)
      // base's block declares cnt=2; flip the count varint (zigzag 2 =
      // 0x04) to zigzag 1 = 0x02. Walk back over final sync, payload,
      // and the len varint (whose width depends on the payload size).
      def zzSize(v: Long): Int = {
        var z = ((v << 1) ^ (v >> 63)) >>> 7; var n = 1
        while (z != 0) { n += 1; z >>>= 7 }
        n
      }
      val cntPos = base.length - 16 - two.length - zzSize(two.length.toLong) - 1
      assert((base(cntPos) & 0xff) == 4, s"count varint location: ${base(cntPos)}")
      base(cntPos) = 2
      base
    }
    val ms = parseManifest(spliced)
    assert(ms.nMalformedBlocks == 1 && ms.entries.isEmpty,
      s"under-consumption must not pass: $ms")
    assert(hdr.nonEmpty) // silence unused
  }

  test("sync-marker mismatch halts with the walked prefix kept") {
    val bytes = encodeManifest(Seq(Seq(e0), Seq(e1)), syncSeed = 11L)
    // corrupt the FIRST block's trailing sync
    val firstSyncPos = bytes.length - 16 - // final sync
      (2 + encodeEntry(e1).length) - 16 // second block hdr+payload, its sync
    bytes(firstSyncPos + 3) = (bytes(firstSyncPos + 3) ^ 0x7f).toByte
    val m = parseManifest(bytes)
    assert(m.valid == 0, "desynced container cannot be trusted past the break")
    assert(m.entries.isEmpty || m.entries == Seq(e0))
    assert(m.trailingBytes > 0)
  }

  test("bounds array: the negative-count block form decodes (spec allows it)") {
    // hand-encode an entry whose bounds array uses count=-1 + byteLen
    val out = new java.io.ByteArrayOutputStream()
    def zzl(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def binb(b: Array[Byte]): Unit = { zzl(b.length.toLong); out.write(b) }
    zzl(1L); zzl(0L) // status=1, snapshot null
    binb("x.parquet".getBytes); binb("PARQUET".getBytes)
    zzl(0L); zzl(5L); zzl(50L) // partition 0, rows 5, size 50
    // lower_bounds: union 1, then a NEGATIVE block count (-1) with size
    val item = new java.io.ByteArrayOutputStream()
    val iz = new java.io.DataOutputStream(item)
    // key=1 zigzag -> 0x02; value bytes len 8 + LE
    item.write(2)
    item.write(16) // zigzag(8)
    (0 until 8).foreach(i => item.write(((33L >> (8 * i)) & 0xff).toInt))
    zzl(1L); zzl(-1L); zzl(item.size.toLong); item.writeTo(out); zzl(0L)
    zzl(0L) // upper_bounds: null
    iz.flush()
    val entryBytes = out.toByteArray
    // frame it
    val frame = {
      val f = new java.io.ByteArrayOutputStream()
      f.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
      def wz(v0: Long): Unit = { var v = (v0 << 1) ^ (v0 >> 63)
        while ((v & ~0x7fL) != 0) { f.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
        f.write(v.toInt) }
      def wb(b: Array[Byte]): Unit = { wz(b.length.toLong); f.write(b) }
      wz(1L); wb("avro.schema".getBytes); wb(IcebergOps.SchemaJson.getBytes)
      wz(0L)
      val sync = new Array[Byte](16)
      f.write(sync)
      wz(1L); wz(entryBytes.length.toLong); f.write(entryBytes); f.write(sync)
      f.toByteArray
    }
    val m = parseManifest(frame)
    assert(m.entries.size == 1, m.toString)
    assert(m.entries.head.bounds.isEmpty, "lower without upper is not a usable bound")
    assert(m.nMalformedBlocks == 0)
  }

  // -------------------------------------------------- manifest lists

  private val f0 = MFile("m0.avro", 1000L, 0, Some(1042L), 3, 1, 2)
  private val f1 = MFile("m1.avro", 2000L, 1, None, 0, 5, 0)

  test("manifest-list round-trip: unions, optional counts, negative ids") {
    val lm = parseManifestList(encodeManifestList(Seq(f0, f1), syncSeed = 3L))
    assert(lm.valid == 1 && lm.schemaOk == 1)
    assert(lm.files == Seq(f0, f1), lm.files.toString)
    val neg = MFile("x.avro", Long.MaxValue, 2, Some(-9L), 1, 0, 1)
    assert(parseManifestList(encodeManifestList(Seq(neg), 5L)).files == Seq(neg))
  }

  test("manifest-list schema drift and codec drift zero the decode, framing intact") {
    val drift = encodeManifestList(Seq(f0), syncSeed = 3L,
      schema = ListSchemaJson.replace("manifest_file", "other_rec"))
    val lm = parseManifestList(drift)
    assert(lm.valid == 1 && lm.schemaOk == 0 && lm.files.isEmpty)
  }

  test("manifest-list truncation fails closed: never a partial record") {
    val full = encodeManifestList(Seq(f0, f1), syncSeed = 11L)
    (1 until full.length).foreach { cut =>
      val lm = parseManifestList(full.take(cut))
      assert(lm.files.isEmpty || lm.files == Seq(f0, f1) ||
        lm.files == Seq(f0), s"cut $cut produced a phantom record")
    }
  }
}
