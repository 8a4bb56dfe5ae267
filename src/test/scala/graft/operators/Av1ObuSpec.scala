package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AV1 OBU walk + sequence-header decode: encoder/decoder round-trip
  * across the knob grid, the IVF layer, cross-frame sequence-header
  * carry, size-less-OBU legality, and the truncation/corruption
  * fail-closed contract.
  */
class Av1ObuSpec extends AnyFunSuite {

  private def hdr(profile: Int = 0, level: Int = 8, tier: Int = 1,
      width: Long = 320, height: Long = 180, bitDepth: Int = 8,
      mono: Boolean = false, sb128: Boolean = false, still: Boolean = false,
      reduced: Boolean = false): Array[Byte] =
    Av1Obu.encodeSeqHdr(profile, level, tier, width, height, bitDepth,
      mono, sb128, still, reduced)

  test("sequence header round-trips across the knob grid") {
    for {
      profile <- Seq(0, 1, 2)
      reduced <- Seq(false, true)
      level <- Seq(5, 12)
      mono <- Seq(false, true)
      if !(mono && profile == 1) // profile 1 carries no mono flag
      bd <- (if (profile == 2) Seq(8, 10, 12) else Seq(8, 10))
    } {
      val tier = if (level > 7 && !reduced) 1 else 0
      val b = hdr(profile, level, tier, 1920, 1080, bd, mono,
        sb128 = true, still = reduced, reduced = reduced)
      val s = Av1Obu.parseSeqHdr(b, 0, b.length)
      assert(s.ok == 1, s"p=$profile r=$reduced bd=$bd mono=$mono: $s")
      assert(s.profile == profile && s.level == level && s.tier == tier)
      assert(s.width == 1920 && s.height == 1080)
      assert(s.bitDepth == bd && s.mono == (if (mono) 1 else 0))
      assert(s.superblock128 == 1 && s.reduced == (if (reduced) 1 else 0))
    }
  }

  test("IVF walk: OBU counts by type, sequence header carried ACROSS frames") {
    val seq = Av1Obu.encodeObu(1, hdr(width = 640, height = 360))
    val td = Av1Obu.encodeObu(2, Array.emptyByteArray)
    val frame = Av1Obu.encodeObu(6, Array.fill(20)(3.toByte))
    // the sequence header sits in the SECOND frame
    val ivf = Av1Obu.encodeIvf(640, 360, Seq(td ++ frame, td ++ seq ++ frame))
    val m = Av1Obu.parseIvf(ivf)
    assert(m.ivfOk == 1 && m.nFramesWalked == 2 && m.malformedFrame == 0)
    assert(m.nObus == 5 && m.nSeq == 1 && m.nFrameObus == 2)
    assert(m.seq.ok == 1 && m.seq.width == 640 && m.seq.height == 360,
      m.toString)
    // extension-header OBUs walk too
    val withExt = Av1Obu.encodeObu(6, Array.fill(5)(1.toByte), withExt = true)
    val m2 = Av1Obu.walkObus(td ++ withExt, 0, (td ++ withExt).length)
    assert(m2.exists(_.nFrames == 1))
  }

  test("size-less OBU: legal as the LAST of a frame, malformed anywhere else") {
    val td = Av1Obu.encodeObu(2, Array.emptyByteArray)
    val tail = Av1Obu.encodeObu(6, Array.fill(9)(7.toByte), withSize = false)
    val ok = Av1Obu.walkObus(td ++ tail, 0, (td ++ tail).length)
    assert(ok.exists(m => m.nObus == 2 && m.nFrames == 1))
    // size-less FOLLOWED by more bytes: the walk consumes to the end as
    // one OBU — the follower is swallowed, so counts must reflect the
    // honest 2-OBU reading, never a guessed 3
    val sw = Av1Obu.walkObus(td ++ tail ++ td, 0, (td ++ tail ++ td).length)
    assert(sw.exists(_.nObus == 2), sw.toString)
  }

  test("truncated sequence header fails closed at every cut; corrupt header kills the frame, not the file") {
    val full = hdr(profile = 2, level = 9, tier = 1, bitDepth = 12)
    assert(Av1Obu.parseSeqHdr(full, 0, full.length).ok == 1)
    for (cut <- 0 until full.length) {
      val s = Av1Obu.parseSeqHdr(full.take(cut), 0, cut)
      assert(s.ok == 0 && s.width == 0 && s.height == 0, s"cut $cut: $s")
    }
    // forbidden bit on the second frame's first OBU: frame 1 counts,
    // frame 2 is declined, the census says so
    val seqObu = Av1Obu.encodeObu(1, full)
    val good = Av1Obu.encodeObu(2, Array.emptyByteArray) ++ seqObu
    val bad = Array(0x80.toByte) ++ Array.fill(4)(0.toByte)
    val ivf = Av1Obu.encodeIvf(64, 64, Seq(good, bad))
    val m = Av1Obu.parseIvf(ivf)
    assert(m.ivfOk == 1 && m.nFramesWalked == 1 && m.malformedFrame == 1)
    assert(m.seq.ok == 1, "frame 1's header is evidence regardless")
    // and a non-AV01 fourcc declines the file whole
    val notAv1 = ivf.clone(); notAv1(8) = 'X'.toByte
    assert(Av1Obu.parseIvf(notAv1).ivfOk == 0)
  }
}
