package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZipOps contract: EOCD backward discovery (payloads contain `PK`
  * runs by construction), central↔local cross-check semantics, and
  * stop-don't-guess on structural corruption.
  */
class ZipOpsSpec extends AnyFunSuite {

  private def archive = ZipOps.encodeSynthetic(Seq(
    ("a.txt", 8, 60, 150),
    ("b.bin", 0, 200, 200),
    ("c.json", 8, 40, 90)))

  test("round-trip: entries, method mix, byte masses, no mismatches") {
    val m = ZipOps.parse(archive)
    assert(m.eocdFound == 1 && m.nEntries == 3)
    assert(m.nStored == 1 && m.nDeflated == 2 && m.nOtherMethod == 0)
    assert(m.sumCompBytes == 300 && m.sumUncompBytes == 440)
    assert(m.centralBytes == (46 + 5) + (46 + 5) + (46 + 6))
    assert(m.nLocalMismatch == 0 && m.trailingBytes == 0)
  }

  test("payloads contain PK bytes yet discovery is exact (EOCD, not scanning)") {
    // encodeSynthetic plants 'P','K' every 97 bytes of filler — if the
    // parser scanned forward for signatures it would desync; the
    // round-trip above passing AND this byte-presence check make the
    // discovery path the proven one
    val bytes = archive
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(text.indexOf("PK") < text.lastIndexOf("PK")) // multiple PK runs exist
  }

  test("zip comment after EOCD is handled (EOCD found despite trailing comment)") {
    // rebuild with a comment: encodeSynthetic writes comment_len 0, so
    // append a comment AND fix the length field manually
    val base = archive
    val comment = "dataset v1".getBytes("US-ASCII")
    val out = new Array[Byte](base.length + comment.length)
    System.arraycopy(base, 0, out, 0, base.length)
    System.arraycopy(comment, 0, out, base.length, comment.length)
    // comment_len lives at EOCD+20; EOCD starts 22 from the old end
    val eocd = base.length - 22
    out(eocd + 20) = comment.length.toByte
    val m = ZipOps.parse(out)
    assert(m.eocdFound == 1 && m.nEntries == 3 && m.trailingBytes == 0)
  }

  test("no EOCD: everything is trailing") {
    val cut = archive.take(archive.length - 10) // truncates the EOCD
    val m = ZipOps.parse(cut)
    assert(m.eocdFound == 0 && m.nEntries == 0 && m.trailingBytes == cut.length)
  }

  test("corrupted central entry signature stops the walk there") {
    val bytes = archive.clone()
    // central directory offset from EOCD
    def u32(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    val eocd = bytes.length - 22
    val cdOff = u32(eocd + 16).toInt
    val secondEntry = cdOff + 46 + 5 // after "a.txt" entry
    bytes(secondEntry) = 'X'
    val m = ZipOps.parse(bytes)
    assert(m.nEntries == 1 && m.trailingBytes > 0)
  }

  test("local-header tampering is counted as mismatch, not fatal") {
    val bytes = archive.clone()
    // first local header name starts at offset 30
    bytes(30) = 'z' // name no longer matches the central record
    val m = ZipOps.parse(bytes)
    assert(m.nEntries == 3 && m.nLocalMismatch == 1 && m.trailingBytes == 0)
  }

  test("empty input and garbage input have no EOCD") {
    assert(ZipOps.parse(Array.emptyByteArray).eocdFound == 0)
    val g = Array.fill(100)(7.toByte)
    val m = ZipOps.parse(g)
    assert(m.eocdFound == 0 && m.trailingBytes == 100)
  }

  test("a CD offset pointing past the file fails closed (no negative trailing)") {
    // WalkerFuzzSpec catch: a 0xFF window over the EOCD's cd-offset
    // field made `n - cdOff` go NEGATIVE (cdOff ≈ 16 MiB on a 255-byte
    // file). Nothing beyond the EOCD record is validated in that case,
    // so the whole file must report as trailing.
    val bytes = archive
    val n = bytes.length
    // EOCD is the last 22 bytes (no comment); offset field at eocd+16
    val eocd = n - 22
    for (i <- 0 until 4) bytes(eocd + 16 + i) = 0xFF.toByte
    val m = ZipOps.parse(bytes)
    assert(m.eocdFound == 1 && m.nEntries == 0)
    assert(m.trailingBytes == n.toLong, s"trailing ${m.trailingBytes} != $n")
    // huge cd SIZE with a sane offset is the same class
    val b2 = archive
    for (i <- 0 until 4) b2(b2.length - 22 + 12 + i) = 0xFF.toByte
    val m2 = ZipOps.parse(b2)
    assert(m2.trailingBytes == b2.length.toLong && m2.nEntries == 0)
  }
}
