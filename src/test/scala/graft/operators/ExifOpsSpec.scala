package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ExifOps contract: both TIFF byte orders, IFD0 entry classification
  * (orientation value read, GPS/Exif-pointer/DateTime/Make presence),
  * layout arithmetic, and stop-don't-guess on the malformed-input
  * classes (bad SOI/APP1, lying APP1 length, wrong magic, IFD
  * overrun).
  */
class ExifOpsSpec extends AnyFunSuite {

  test("little-endian round-trip: all tags present, byte masses exact") {
    val b = ExifOps.encodeSynthetic(littleEndian = true, orientation = 6,
      withGps = true, withExifIfd = true, withDateTime = true,
      withMake = true, imageLen = 123)
    val m = ExifOps.parse(b)
    assert(m.valid == 1 && m.littleEndian == 1)
    assert(m.nIfd0Entries == 5 && m.orientation == 6)
    assert(m.hasGps == 1 && m.hasExifIfd == 1 && m.hasDateTime == 1 && m.hasMake == 1)
    // 24 fixed + 12·n entries + 6 (make) + 20 (datetime) + 6+6 (sub-IFDs)
    assert(m.app1Bytes == 24 + 12 * 5 + 6 + 20 + 6 + 6)
    assert(m.imageBytes == 123 && m.trailingBytes == 0)
    assert(b.length == m.app1Bytes + 2 + 123) // SOI + segment + scan
  }

  test("big-endian (MM) parses identically to II") {
    for (le <- Seq(true, false)) {
      val m = ExifOps.parse(ExifOps.encodeSynthetic(le, orientation = 8,
        withGps = true, withExifIfd = false, withDateTime = false,
        withMake = false, imageLen = 0))
      assert(m.valid == 1 && m.littleEndian == (if (le) 1 else 0))
      assert(m.orientation == 8 && m.hasGps == 1 && m.nIfd0Entries == 2)
    }
  }

  test("empty IFD0 (no tags at all) is valid TIFF") {
    val m = ExifOps.parse(ExifOps.encodeSynthetic(littleEndian = true,
      orientation = 0, withGps = false, withExifIfd = false,
      withDateTime = false, withMake = false, imageLen = 10))
    assert(m.valid == 1 && m.nIfd0Entries == 0 && m.orientation == 0)
    assert(m.app1Bytes == 24 && m.imageBytes == 10)
  }

  test("missing SOI / missing APP1 marker stop at the right offset") {
    val b = ExifOps.encodeSynthetic(true, 1, false, false, false, false, 5)
    val noSoi = b.clone(); noSoi(0) = 0x00
    assert(ExifOps.parse(noSoi).valid == 0)
    assert(ExifOps.parse(noSoi).trailingBytes == b.length)
    val noApp1 = b.clone(); noApp1(3) = 0xE0.toByte // APP0 instead
    assert(ExifOps.parse(noApp1).valid == 0)
    assert(ExifOps.parse(noApp1).trailingBytes == b.length - 2)
  }

  test("input truncated inside the APP1 length field fails closed") {
    // `FF D8 FF E1` with 0–1 bytes of the length field present: the
    // parser must not read past the array (was an AIOOBE at n ∈ {4,5})
    val hdr = Array(0xFF, 0xD8, 0xFF, 0xE1).map(_.toByte)
    for (extra <- 0 to 1) {
      val cut = hdr ++ Array.fill(extra)(0x7f.toByte)
      val m = ExifOps.parse(cut)
      assert(m.valid == 0 && m.trailingBytes == cut.length - 4, s"n=${cut.length}")
    }
  }

  test("APP1 length running past EOF is a lie, not a guess") {
    val b = ExifOps.encodeSynthetic(true, 3, true, false, false, false, 0)
    val cut = b.take(b.length - 8) // truncate inside the TIFF payload
    val m = ExifOps.parse(cut)
    assert(m.valid == 0 && m.trailingBytes == cut.length - 4)
  }

  test("corrupted Exif header and TIFF magic stop the walk") {
    val b = ExifOps.encodeSynthetic(true, 1, false, false, false, false, 0)
    val badHdr = b.clone(); badHdr(6) = 'J'
    assert(ExifOps.parse(badHdr).valid == 0)
    val badOrder = b.clone(); badOrder(12) = 'X'
    assert(ExifOps.parse(badOrder).valid == 0)
    val badMagic = b.clone(); badMagic(14) = 43 // II: low byte first
    assert(ExifOps.parse(badMagic).valid == 0)
  }

  test("IFD0 offset or entry table overrunning the segment stops") {
    val b = ExifOps.encodeSynthetic(true, 1, false, false, false, false, 0)
    val farIfd = b.clone()
    farIfd(16) = 0xFF.toByte // IFD0 offset low byte → way past segment
    assert(ExifOps.parse(farIfd).valid == 0)
    val bigCnt = b.clone()
    bigCnt(21) = 0x40 // entry count high byte (II) → 0x4001 entries
    assert(ExifOps.parse(bigCnt).valid == 0)
  }

  test("orientation SHORT reads left-justified in both byte orders") {
    for (le <- Seq(true, false); o <- 1 to 8) {
      val m = ExifOps.parse(ExifOps.encodeSynthetic(le, o,
        withGps = false, withExifIfd = false, withDateTime = false,
        withMake = false, imageLen = 0))
      assert(m.orientation == o, s"le=$le o=$o")
    }
  }
}
