package graft.operators

import graft.SparkSpec

/** [[IsoBmff]] — the MP4 box walker behind q319. */
class IsoBmffSpec extends SparkSpec {

  test("round-trip: skeleton facts recovered") {
    val b = IsoBmff.encodeSynthetic("mp42", 1200, 6000, 2, 250)
    val m = IsoBmff.parse(b)
    assert(m.brand == "mp42" && m.nBoxes == 8 && m.nTracks == 2)
    assert(m.timescale == 1200L && m.duration == 6000L && m.durationMs == 5000L)
    assert(m.mdatBytes == 250L && m.maxDepth == 3 && m.trailingBytes == 0L)
  }

  test("size smaller than header halts with trailing report") {
    val good = IsoBmff.encodeSynthetic("isom", 600, 600, 1, 10)
    val bad = Array[Byte](0, 0, 0, 4, 'f', 'r', 'e', 'e') // size 4 < 8
    val m = IsoBmff.parse(good ++ bad)
    assert(m.nBoxes == 6 && m.trailingBytes == 8L)
  }

  test("size overrunning the file halts") {
    val good = IsoBmff.encodeSynthetic("isom", 600, 600, 1, 10)
    val bad = Array[Byte](0, 0, 2, 0, 'f', 'r', 'e', 'e') // claims 512 bytes
    val m = IsoBmff.parse(good ++ bad)
    assert(m.trailingBytes == 8L)
  }

  test("largesize (size==1) boxes parse") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val payload = Array.fill(12)(7.toByte)
    val large = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      Array.fill(4)(0.toByte) ++ be32(16 + payload.length) ++ payload
    val m = IsoBmff.parse(large)
    assert(m.nBoxes == 1 && m.mdatBytes == 12L && m.trailingBytes == 0L)
  }

  test("size==0 box extends to EOF") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val b = be32(0) ++ "mdat".getBytes("US-ASCII") ++ Array.fill(33)(1.toByte)
    val m = IsoBmff.parse(b)
    assert(m.nBoxes == 1 && m.mdatBytes == 33L && m.trailingBytes == 0L)
  }

  test("sub-header slack is trailing, not a phantom box") {
    val good = IsoBmff.encodeSynthetic("isom", 600, 600, 1, 10)
    val m = IsoBmff.parse(good ++ Array[Byte](0, 0, 0))
    assert(m.trailingBytes == 3L)
  }

  test("empty input is safe") {
    val m = IsoBmff.parse(Array.emptyByteArray)
    assert(m.nBoxes == 0 && m.trailingBytes == 0L)
  }

  test("huge 64-bit largesize halts instead of wrapping the bounds check") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // size0==1, largesize=Long.MaxValue: `pos + size` wraps negative —
    // the subtraction-form check must still reject it fail-closed
    val evil = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      Array(0x7f.toByte) ++ Array.fill(7)(0xff.toByte) ++ Array.fill(24)(3.toByte)
    val m = IsoBmff.parse(evil)
    assert(m.nBoxes == 0 && m.mdatBytes == 0L && m.trailingBytes == evil.length.toLong)
    // same with the sign bit set (negative Long): caught by size < hdr
    val evil2 = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      Array.fill(8)(0xff.toByte) ++ Array.fill(24)(3.toByte)
    val m2 = IsoBmff.parse(evil2)
    assert(m2.nBoxes == 0 && m2.trailingBytes == evil2.length.toLong)
  }

  test("nested-container bomb halts at the depth cap, no stack overflow") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // 200k nested moov headers, each box exactly wrapping the next
    val levels = 200000
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < levels) {
      out.write(be32((levels - i) * 8)); out.write("moov".getBytes("US-ASCII"))
      i += 1
    }
    val m = IsoBmff.parse(out.toByteArray)
    assert(m.maxDepth == IsoBmff.MaxDepth)
    assert(m.nBoxes == IsoBmff.MaxDepth)
    assert(m.trailingBytes == (levels - IsoBmff.MaxDepth).toLong * 8)
  }
}
