package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TarOps contract: round-trip on clean shards, sample grouping +
  * required-extension completeness, and stop-don't-guess on header
  * corruption — the checksum verification is what catches a flipped
  * size byte BEFORE it desynchronizes every later entry.
  */
class TarOpsSpec extends AnyFunSuite {
  private val Req = Seq("jpg", "json")

  private def shard = TarOps.encodeSynthetic(Seq(
    "a.jpg" -> 700, "a.json" -> 80,
    "b.jpg" -> 512, "b.json" -> 90, "b.txt" -> 33,
    "c.jpg" -> 100)) // c is missing .json → incomplete

  test("round-trip: entries, samples, completeness, byte accounting") {
    val m = TarOps.parse(shard, Req)
    assert(m.nEntries == 6 && m.nSamples == 3)
    assert(m.nCompleteSamples == 2) // a and b; c lacks .json
    assert(m.sumFileBytes == 700 + 80 + 512 + 90 + 33 + 100)
    // padding: 700→1024, 80→512, 512→512 (exact), 90→512, 33→512, 100→512
    assert(m.sumPaddingBytes == 324 + 432 + 0 + 422 + 479 + 412)
    assert(m.archiveBytes == 6 * 512 + (1024 + 512 + 512 + 512 + 512 + 512) + 1024)
    assert(m.trailingBytes == 0)
  }

  test("a flipped payload-size byte fails the checksum and stops the walk") {
    val bytes = shard.clone()
    // first header's size field (offset 124) — bump a digit without
    // updating the checksum
    bytes(124 + 5) = (bytes(124 + 5) + 1).toByte
    val m = TarOps.parse(bytes, Req)
    assert(m.nEntries == 0 && m.trailingBytes == bytes.length)
  }

  test("corrupted magic stops at that entry, keeping earlier ones") {
    val bytes = shard.clone()
    // entry 2 starts after header(512) + padded(1024) + header + padded(512):
    val off2 = 512 + 1024 + 512 + 512
    bytes(off2 + 257) = 'X'
    val m = TarOps.parse(bytes, Req)
    assert(m.nEntries == 2 && m.nSamples == 1)
    assert(m.trailingBytes == bytes.length - off2)
  }

  test("truncated payload stops at the entry's header") {
    val cut = shard.take(512 + 100) // first file claims 700 bytes, only 100 present
    val m = TarOps.parse(cut, Req)
    assert(m.nEntries == 0 && m.trailingBytes == cut.length)
  }

  test("lone zero block (missing second end block) is malformed") {
    val one = TarOps.encodeSynthetic(Seq("x.jpg" -> 10))
    val bytes = one.take(one.length - 512) // drop the second end block
    val m = TarOps.parse(bytes, Req)
    assert(m.nEntries == 1)
    assert(m.trailingBytes == 512) // the lone zero block is not a valid end
  }

  test("bytes after the end-of-archive blocks are trailing") {
    val bytes = TarOps.encodeSynthetic(Seq("x.jpg" -> 10)) ++ Array.fill(77)(1.toByte)
    val m = TarOps.parse(bytes, Req)
    assert(m.nEntries == 1 && m.trailingBytes == 77)
  }

  test("non-octal size field stops the walk") {
    val bytes = shard.clone()
    bytes(124) = '9' // 9 is not an octal digit
    val m = TarOps.parse(bytes, Req)
    assert(m.nEntries == 0 && m.trailingBytes == bytes.length)
  }

  test("empty archive (just end blocks) and empty input") {
    val m = TarOps.parse(TarOps.encodeSynthetic(Nil), Req)
    assert(m.nEntries == 0 && m.nSamples == 0 && m.trailingBytes == 0)
    assert(m.archiveBytes == 1024)
    val e = TarOps.parse(Array.emptyByteArray, Req)
    assert(e.nEntries == 0 && e.trailingBytes == 0)
  }

  test("extensionless file groups under its own name and never completes") {
    val m = TarOps.parse(TarOps.encodeSynthetic(Seq("README" -> 5)), Seq("jpg"))
    assert(m.nEntries == 1 && m.nSamples == 1 && m.nCompleteSamples == 0)
  }
}
