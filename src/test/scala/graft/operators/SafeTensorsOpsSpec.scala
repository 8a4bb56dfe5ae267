package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** SafeTensorsOps contract: round-trip on clean files, exact header
  * accounting, and stop-don't-guess on every malformed prefix — plus
  * the span checks (mismatch, gap, overlap, truncation) that protect
  * an mmap-ing loader from a lying header.
  */
class SafeTensorsOpsSpec extends AnyFunSuite {

  private def clean = SafeTensorsOps.encodeSynthetic(Seq(
    ("w", "F32", Seq(4, 8)), ("b", "F32", Seq(8)), ("q", "I8", Seq(16))))

  test("round-trip: tensors, params, spans, header and data bytes") {
    val m = SafeTensorsOps.parse(clean)
    assert(m.validJson == 1 && m.nTensors == 3)
    assert(m.paramCount == 32L + 8L + 16L)
    assert(m.dataBytes == 128L + 32L + 16L)
    assert(m.nSizeMismatch == 0 && m.contiguous == 1)
    assert(m.truncated == 0 && m.trailingBytes == 0L)
    assert(8L + m.headerBytes + m.dataBytes == clean.length.toLong)
  }

  test("a declared span shorter than dtype*shape is a size mismatch") {
    val m = SafeTensorsOps.parse(SafeTensorsOps.encodeSynthetic(
      Seq(("w", "F16", Seq(10)), ("v", "F32", Seq(3))), spanDelta = 2L))
    assert(m.nSizeMismatch == 1)
    assert(m.trailingBytes == 2L) // bytes the header no longer claims
  }

  test("missing data bytes are reported as truncation, not guessed") {
    val m = SafeTensorsOps.parse(SafeTensorsOps.encodeSynthetic(
      Seq(("w", "I8", Seq(40))), dropData = 5))
    assert(m.truncated == 1 && m.trailingBytes == 0L)
  }

  test("files shorter than the 8-byte prefix or the declared header fail closed") {
    assert(SafeTensorsOps.parse(Array[Byte](1, 2, 3)).validJson == 0)
    val huge = clean.clone()
    huge(0) = -1; huge(1) = -1; huge(2) = -1 // header length >> file
    assert(SafeTensorsOps.parse(huge).validJson == 0)
  }

  test("a header length near Long.MaxValue cannot wrap the bounds check") {
    val bos = new java.io.ByteArrayOutputStream()
    val hlen = Long.MaxValue - 3
    (0 until 8).foreach(i => bos.write(((hlen >>> (8 * i)) & 0xff).toInt))
    (0 until 32).foreach(_ => bos.write('{'))
    val m = SafeTensorsOps.parse(bos.toByteArray)
    assert(m.validJson == 0 && m.nTensors == 0)
  }

  test("garbage JSON in the header yields valid_json = 0 with the tail intact") {
    val blob = clean.clone()
    blob(9) = '~' // corrupt one header byte → unparseable
    val m = SafeTensorsOps.parse(blob)
    assert(m.validJson == 0 && m.nTensors == 0)
    assert(m.trailingBytes == clean.length - 8L - m.headerBytes)
  }

  test("__metadata__ is skipped; gaps and overlaps break contiguity") {
    def file(json: String, dataLen: Int): Array[Byte] = {
      val hb = json.getBytes("UTF-8")
      val bos = new java.io.ByteArrayOutputStream()
      (0 until 8).foreach(i => bos.write(((hb.length.toLong >>> (8 * i)) & 0xff).toInt))
      bos.write(hb); (0 until dataLen).foreach(_ => bos.write(7))
      bos.toByteArray
    }
    val meta = SafeTensorsOps.parse(file(
      """{"__metadata__":{"format":"pt"},"w":{"dtype":"I8","shape":[4],"data_offsets":[0,4]}}""", 4))
    assert(meta.nTensors == 1 && meta.contiguous == 1)
    val gap = SafeTensorsOps.parse(file(
      """{"a":{"dtype":"I8","shape":[4],"data_offsets":[0,4]},""" +
        """"b":{"dtype":"I8","shape":[4],"data_offsets":[6,10]}}""", 10))
    assert(gap.contiguous == 0)
    val overlap = SafeTensorsOps.parse(file(
      """{"a":{"dtype":"I8","shape":[4],"data_offsets":[0,4]},""" +
        """"b":{"dtype":"I8","shape":[4],"data_offsets":[2,6]}}""", 6))
    assert(overlap.contiguous == 0)
  }

  test("an unknown dtype counts as a mismatch instead of crashing the walk") {
    val hb =
      """{"w":{"dtype":"F8_E4M3","shape":[4],"data_offsets":[0,4]}}"""
    val bos = new java.io.ByteArrayOutputStream()
    val b = hb.getBytes("UTF-8")
    (0 until 8).foreach(i => bos.write(((b.length.toLong >>> (8 * i)) & 0xff).toInt))
    bos.write(b); (0 until 4).foreach(_ => bos.write(1))
    val m = SafeTensorsOps.parse(bos.toByteArray)
    assert(m.validJson == 1 && m.nSizeMismatch == 1 && m.nTensors == 1)
  }
}
