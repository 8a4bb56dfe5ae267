package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GgufOps contract: round-trip byte accounting on clean headers and
  * stop-don't-guess on the typed-walk traps — an unknown value type,
  * a truncated tensor info, a string length pointing past EOF, and a
  * wrong magic/version all fail closed at a known position.
  */
class GgufOpsSpec extends AnyFunSuite {

  private def clean = GgufOps.encodeSynthetic(
    kvStrings = Seq("general.architecture" -> "llama", "general.name" -> "m7"),
    kvScalars = Seq("s0" -> 4, "s1" -> 10),
    kvArrays = Seq("arr" -> 3),
    tensors = Seq(("blk.0.w", Seq(8L, 4L), 0), ("blk.1.w", Seq(8L, 5L), 1)))

  test("round-trip: kv classes, byte accounting, params, clean tail") {
    val m = GgufOps.parse(clean)
    assert(m.valid == 1 && m.version == 3)
    assert(m.nKv == 5 && m.nKvString == 2 && m.nKvScalar == 2 && m.nKvArray == 1)
    assert(m.nTensors == 2 && m.paramCount == 32L + 40L)
    assert(m.headerBytes == clean.length.toLong && m.trailingBytes == 0L)
    // kv bytes: (8+20+4+8+5) + (8+12+4+8+2) + (8+2+4+4) + (8+2+4+8) + (8+3+4+4+8+12)
    assert(m.kvBytes == 45L + 34L + 18L + 22L + 39L)
  }

  test("an unknown value-type id stops the typed walk at that KV") {
    val bad = GgufOps.encodeSynthetic(
      kvStrings = Seq("general.architecture" -> "llama", "general.name" -> "m7"),
      kvScalars = Seq("s0" -> 4), kvArrays = Seq.empty,
      tensors = Seq(("blk.0.w", Seq(4L), 0)), badTypeAt = 1)
    val m = GgufOps.parse(bad)
    assert(m.valid == 0 && m.nKv == 1 && m.nKvString == 1)
    assert(m.kvBytes == 45L && m.headerBytes == 24L + 45L)
    assert(m.trailingBytes == bad.length - 24L - 45L)
  }

  test("truncation inside the final tensor info stops at its start") {
    val m = GgufOps.parse(GgufOps.encodeSynthetic(
      kvStrings = Seq.empty, kvScalars = Seq.empty, kvArrays = Seq.empty,
      tensors = Seq(("blk.0.w", Seq(8L, 4L), 0), ("blk.1.w", Seq(8L, 5L), 1)),
      dropTail = 5))
    assert(m.valid == 0 && m.nTensors == 1 && m.paramCount == 32L)
    assert(m.trailingBytes == 42L)
  }

  test("a string length pointing past EOF fails closed") {
    val blob = GgufOps.encodeSynthetic(
      kvStrings = Seq("k" -> "v"), kvScalars = Seq.empty, kvArrays = Seq.empty,
      tensors = Seq.empty)
    val bad = blob.clone()
    bad(24 + 3) = 0x7f // key length u64 → huge
    val m = GgufOps.parse(bad)
    assert(m.valid == 0 && m.nKv == 0)
  }

  test("huge string lengths and array counts cannot wrap the bounds math") {
    def header(nKv: Long): java.io.ByteArrayOutputStream = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write('G'); bos.write('G'); bos.write('U'); bos.write('F')
      (0 until 4).foreach(i => bos.write(((3L >>> (8 * i)) & 0xff).toInt))
      (0 until 8).foreach(_ => bos.write(0)) // tensor count 0
      (0 until 8).foreach(i => bos.write(((nKv >>> (8 * i)) & 0xff).toInt))
      bos
    }
    def u64(bos: java.io.ByteArrayOutputStream, v: Long): Unit =
      (0 until 8).foreach(i => bos.write(((v >>> (8 * i)) & 0xff).toInt))
    def u32(bos: java.io.ByteArrayOutputStream, v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >>> (8 * i)) & 0xff).toInt))
    // key length near Long.MaxValue: pos + len would wrap negative
    val h1 = header(1)
    u64(h1, Long.MaxValue - 5)
    (0 until 16).foreach(_ => h1.write('k'))
    val m1 = GgufOps.parse(h1.toByteArray)
    assert(m1.valid == 0 && m1.nKv == 0)
    // array count where cnt * width wraps to 0: would pass as empty
    val h2 = header(1)
    u64(h2, 1L); h2.write('a')       // key "a"
    u32(h2, 9L)                      // type: array
    u32(h2, 10L)                     // elem type: u64 (width 8)
    u64(h2, 0x2000000000000000L)     // count: cnt * 8 == 0 in Long
    val m2 = GgufOps.parse(h2.toByteArray)
    assert(m2.valid == 0 && m2.nKvArray == 0, m2)
  }

  test("wrong magic and unsupported version fail closed immediately") {
    val blob = clean.clone(); blob(0) = 'X'
    assert(GgufOps.parse(blob).valid == 0)
    val v2 = clean.clone(); v2(4) = 2
    assert(GgufOps.parse(v2).valid == 0)
    assert(GgufOps.parse(Array[Byte]('G', 'G', 'U', 'F')).valid == 0)
  }
}
