package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Avro OCF walker — round-trips plus one test per malformed class
  * (house rule), with the negative-count metadata segment and the
  * huge-declared-size injection covered explicitly.
  */
class AvroOpsSpec extends AnyFunSuite {

  private def mk(blocks: Seq[(Long, Int)], codec: String = "null",
      extra: Seq[(String, String)] = Nil): Array[Byte] =
    AvroOps.encodeSynthetic("""{"type":"record","name":"t","fields":[]}""",
      codec, extra, blocks, syncSeed = 0xBEEF)

  test("round-trip: metadata, codec, blocks, records, payload bytes") {
    val m = AvroOps.parse(mk(Seq((100L, 64), (200L, 32)), "snappy",
      Seq("writer.id" -> "w1", "app" -> "graft")))
    assert(m.valid == 1 && m.syncMismatch == 0 && m.trailingBytes == 0)
    assert(m.nMetaEntries == 4 && m.codec == "snappy")
    assert(m.schemaLen == """{"type":"record","name":"t","fields":[]}""".length.toLong)
    assert(m.nBlocks == 2 && m.totalRecords == 300L && m.payloadBytes == 96L)
  }

  test("codec defaults to null when the entry is absent") {
    // hand-build without avro.codec: one schema entry only
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    def zz(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    zz(1L); zz(11L); out.write("avro.schema".getBytes("UTF-8"))
    zz(2L); out.write("{}".getBytes("UTF-8")); zz(0L)
    val sync = Array.fill(16)(7.toByte); out.write(sync)
    zz(5L); zz(3L); out.write(Array[Byte](1, 2, 3)); out.write(sync)
    val m = AvroOps.parse(out.toByteArray)
    assert(m.valid == 1 && m.codec == "null" && m.nMetaEntries == 1)
    assert(m.nBlocks == 1 && m.totalRecords == 5L)
  }

  test("negative-count metadata segment (size-prefixed) parses") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    def zz(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    // one segment of -1 (size-prefixed), then the terminator
    zz(-1L); zz(17L) // segment byte size (advisory; the walker re-derives)
    zz(10L); out.write("avro.codec".getBytes("UTF-8"))
    zz(4L); out.write("zstd".getBytes("UTF-8"))
    zz(0L)
    val sync = Array.fill(16)(9.toByte); out.write(sync)
    val m = AvroOps.parse(out.toByteArray)
    assert(m.valid == 1 && m.codec == "zstd" && m.nMetaEntries == 1 && m.nBlocks == 0)
  }

  test("flipped magic: whole input is trailing") {
    val b = mk(Seq((10L, 20)))
    b(3) = 0x7F.toByte
    val m = AvroOps.parse(b)
    assert(m.valid == 0 && m.nMetaEntries == 0 && m.trailingBytes == b.length.toLong)
  }

  test("truncated final sync: walked prefix kept, remainder trailing") {
    val b = mk(Seq((10L, 20), (11L, 20)))
    val m = AvroOps.parse(b.dropRight(5))
    assert(m.valid == 0 && m.nBlocks == 1 && m.totalRecords == 10L)
    assert(m.trailingBytes == 20L + 18 - 5)
  }

  test("flipped block sync: halt at that block, mismatch flagged") {
    val b = mk(Seq((10L, 20), (11L, 20)))
    b(b.length - 1) = (b(b.length - 1) ^ 0x5A).toByte
    val m = AvroOps.parse(b)
    assert(m.valid == 0 && m.syncMismatch == 1 && m.nBlocks == 1)
    assert(m.trailingBytes == 20L + 18)
  }

  test("huge declared block size: overflow-proof halt, prefix kept") {
    val good = mk(Seq((10L, 20)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(good)
    // append a block declaring ~2^62 payload bytes
    def zz(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    zz(1L); zz(1L << 62)
    val m = AvroOps.parse(out.toByteArray)
    assert(m.valid == 0 && m.nBlocks == 1 && m.totalRecords == 10L)
  }

  test("negative declared block count: rejected, not summed") {
    val good = mk(Seq((10L, 20)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(good)
    def zz(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    zz(-5L); zz(0L)
    val m = AvroOps.parse(out.toByteArray)
    assert(m.valid == 0 && m.totalRecords == 10L) // the poisoned block never counted
  }

  test("two near-2^63 declared counts halt as malformed, not wrap negative") {
    // each block is tiny (size=0: zero-field records are zero bytes,
    // so a huge cnt is legal-SHAPED) but the pair would wrap
    // totalRecords past Long.MaxValue — addExact must halt the walk at
    // the second block with the first block's count kept
    val big = Long.MaxValue - 3L
    val m = AvroOps.parse(mk(Seq((big, 0), (big, 0))))
    assert(m.valid == 0 && m.nBlocks == 1 && m.totalRecords == big)
    assert(m.totalRecords >= 0L)
  }

  test("unterminated varint in the header is rejected, not spun on") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    for (_ <- 0 until 12) out.write(0x80)
    val m = AvroOps.parse(out.toByteArray)
    assert(m.valid == 0 && m.nMetaEntries == 0)
  }
}
