package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TfRecordOps contract: the CRC32C kernel against the published test
  * vector, round-trip on clean shards, and stop-don't-guess on every
  * way a shard goes bad — length-byte flips must be caught by the
  * length CRC BEFORE they desynchronize the walk.
  */
class TfRecordOpsSpec extends AnyFunSuite {

  test("crc32c matches the published Castagnoli test vector") {
    // RFC 3720 appendix / the canonical check value: crc32c("123456789")
    val v = "123456789".getBytes("US-ASCII")
    assert(TfRecordOps.crc32c(v, 0, v.length) == 0xE3069283.toInt)
  }

  test("round-trip: counts, payload mass, frame overhead, clean EOF") {
    val blob = TfRecordOps.encodeSynthetic(Seq(100, 0, 7, 300))
    val m = TfRecordOps.parse(blob)
    assert(m.nRecords == 4)
    assert(m.sumPayloadBytes == 407L)
    assert(m.overheadBytes == 64L)
    assert(m.trailingBytes == 0L && m.cleanEof)
    assert(blob.length == 407 + 64)
  }

  test("zero-length records are valid TFRecords") {
    val m = TfRecordOps.parse(TfRecordOps.encodeSynthetic(Seq(0, 0)))
    assert(m.nRecords == 2 && m.sumPayloadBytes == 0L && m.cleanEof)
  }

  test("a flipped length byte stops the walk at that record") {
    val blob = TfRecordOps.encodeSynthetic(Seq(50, 60, 70))
    val bad = blob.clone()
    bad(16 + 50 + 2) = (bad(16 + 50 + 2) ^ 0x40).toByte // record 2 length
    val m = TfRecordOps.parse(bad)
    assert(m.nRecords == 1 && m.sumPayloadBytes == 50L)
    assert(m.trailingBytes == blob.length - 66L && !m.cleanEof)
  }

  test("a flipped length CRC stops the walk at that record") {
    val blob = TfRecordOps.encodeSynthetic(Seq(50, 60))
    val bad = blob.clone()
    bad(8) = (bad(8) ^ 0x01).toByte // record 1's length CRC
    val m = TfRecordOps.parse(bad)
    assert(m.nRecords == 0 && m.trailingBytes == blob.length.toLong)
  }

  test("a flipped payload byte fails the payload CRC") {
    val blob = TfRecordOps.encodeSynthetic(Seq(50, 60))
    val bad = blob.clone()
    bad(12 + 10) = (bad(12 + 10) ^ 0xFF).toByte
    val m = TfRecordOps.parse(bad)
    assert(m.nRecords == 0 && !m.cleanEof)
  }

  test("truncation mid-header and mid-payload both stop cleanly") {
    val blob = TfRecordOps.encodeSynthetic(Seq(50))
    val midHeader = TfRecordOps.parse(blob.take(7))
    assert(midHeader.nRecords == 0 && midHeader.trailingBytes == 7L)
    val midPayload = TfRecordOps.parse(blob.dropRight(10))
    assert(midPayload.nRecords == 0 &&
      midPayload.trailingBytes == blob.length - 10L)
  }

  test("a huge length with a VALID length CRC cannot wrap the bounds check") {
    // the length CRC only proves the length bytes are what the writer
    // wrote — an attacker writes the matching CRC trivially, so the
    // 64-bit bounds check itself must not overflow
    val bos = new java.io.ByteArrayOutputStream()
    val len = 0x7FFFFFFFFFFFFFF0L
    val lenBytes = (0 until 8).map(i => ((len >>> (8 * i)) & 0xff).toByte).toArray
    bos.write(lenBytes)
    val crc = TfRecordOps.mask(TfRecordOps.crc32c(lenBytes, 0, 8))
    (0 until 4).foreach(i => bos.write((crc >>> (8 * i)) & 0xff))
    (0 until 64).foreach(_ => bos.write(0))
    val m = TfRecordOps.parse(bos.toByteArray)
    assert(m.nRecords == 0 && !m.cleanEof)
    assert(m.trailingBytes == bos.size().toLong)
  }

  test("record-header-shaped bytes inside a payload do not desync") {
    // payload of record 1 is a byte-exact smaller TFRecord shard —
    // a resyncing scanner would double count; length framing must not
    val inner = TfRecordOps.encodeSynthetic(Seq(5))
    val lens = Seq(inner.length, 40)
    val blob = TfRecordOps.encodeSynthetic(lens)
    // splice the inner shard in as record 1's payload, re-CRC it
    val spliced = {
      val bos = new java.io.ByteArrayOutputStream()
      def intLE(v: Int): Array[Byte] =
        Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
          .map(_.toByte)
      val lenBytes = (0 until 8).map(i => ((inner.length.toLong >>> (8 * i)) & 0xff).toByte).toArray
      bos.write(lenBytes)
      bos.write(intLE(TfRecordOps.mask(TfRecordOps.crc32c(lenBytes, 0, 8))))
      bos.write(inner)
      bos.write(intLE(TfRecordOps.mask(TfRecordOps.crc32c(inner, 0, inner.length))))
      bos.write(blob.drop(16 + inner.length)) // record 2 unchanged
      bos.toByteArray
    }
    val m = TfRecordOps.parse(spliced)
    assert(m.nRecords == 2, s"resync double-count: ${m.nRecords}")
    assert(m.sumPayloadBytes == inner.length.toLong + 40L && m.cleanEof)
  }
}
