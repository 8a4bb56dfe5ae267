package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FlacOps contract: STREAMINFO bit unpacking (the packed 64-bit
  * field is the whole point), block-chain walking, and
  * stop-don't-guess on the malformed-input classes.
  */
class FlacOpsSpec extends AnyFunSuite {

  test("round-trip: rate/channels/bits/samples and exact duration") {
    val b = FlacOps.encodeSynthetic(44100, 2, 16, 44100L * 7 + 22050, Nil, 50)
    val m = FlacOps.parse(b)
    assert(m.valid == 1)
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.totalSamples == 44100L * 7 + 22050)
    assert(m.durationMs == 7500)
    assert(m.nMetaBlocks == 1 && m.metaBytes == 38 && m.audioBytes == 50)
    assert(m.trailingBytes == 0)
  }

  test("36-bit total-samples and 20-bit rate extremes unpack exactly") {
    val big = (1L << 36) - 1
    val m = FlacOps.parse(FlacOps.encodeSynthetic(655350, 8, 32, big, Nil, 0))
    assert(m.sampleRate == 655350 && m.channels == 8 && m.bitsPerSample == 32)
    assert(m.totalSamples == big)
  }

  test("extra blocks are classified and the chain walks to the last flag") {
    val b = FlacOps.encodeSynthetic(48000, 1, 24, 48000L, Seq((1, 20), (4, 33), (6, 7)), 99)
    val m = FlacOps.parse(b)
    assert(m.nMetaBlocks == 4 && m.nPadding == 1 && m.nVorbisComment == 1)
    assert(m.metaBytes == 38 + 24 + 37 + 11 && m.audioBytes == 99)
  }

  test("bad magic: everything trailing") {
    val b = FlacOps.encodeSynthetic(48000, 1, 16, 100L, Nil, 10)
    b(0) = 'X'
    val m = FlacOps.parse(b)
    assert(m.valid == 0 && m.trailingBytes == b.length)
  }

  test("first block not STREAMINFO violates the spec and stops") {
    val good = FlacOps.encodeSynthetic(48000, 1, 16, 100L, Nil, 10)
    good(4) = (0x01).toByte // rewrite type to PADDING (drops last flag too)
    val m = FlacOps.parse(good)
    assert(m.valid == 0 && m.sampleRate == 0)
  }

  test("block overrunning EOF stops with the remainder trailing") {
    val b = FlacOps.encodeSynthetic(48000, 1, 16, 100L, Seq((1, 50)), 0)
    val cut = b.take(b.length - 30) // truncate inside the padding block
    val m = FlacOps.parse(cut)
    assert(m.valid == 0 && m.nMetaBlocks == 1) // STREAMINFO parsed, padding didn't
    assert(m.trailingBytes == cut.length - 4 - 38)
  }

  test("zero sample rate is invalid per spec") {
    val m = FlacOps.parse(FlacOps.encodeSynthetic(0, 1, 16, 100L, Nil, 10))
    assert(m.valid == 0)
  }

  test("empty and sub-magic inputs") {
    assert(FlacOps.parse(Array.emptyByteArray).valid == 0)
    assert(FlacOps.parse("fLa".getBytes("US-ASCII")).valid == 0)
  }
}
