package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AudioMeta

/** Byte-level vectors for the WAV/RIFF header codec. */
class AudioMetaSpec extends AnyFunSuite {

  test("generator∘parser identity on representative rates/channels") {
    for {
      rate <- Seq(8000, 22050, 44100, 48000)
      ch <- Seq(1, 2)
      n <- Seq(1, 441, 99999)
    } {
      val row = AudioMeta.parse(AudioMeta.wavFixture(rate, ch, 16, n))
      assert(row != null, s"rate=$rate ch=$ch n=$n must parse")
      assert(row.getLong(0) === ch.toLong)
      assert(row.getLong(1) === rate.toLong)
      assert(row.getLong(2) === 16L)
      assert(row.getLong(3) === n.toLong)
      assert(row.getLong(4) === n.toLong * 1000000L / rate)
    }
  }

  test("unrecognized payloads parse to null, not garbage") {
    assert(AudioMeta.parse(null) == null)
    assert(AudioMeta.parse(Array.emptyByteArray) == null)
    assert(AudioMeta.parse("RIFFxxxxWAVE".getBytes("US-ASCII")) == null)
    // right length, wrong magic
    assert(AudioMeta.parse(Array.fill[Byte](44)(0x42)) == null)
    // PCM format field != 1 (e.g. IEEE float = 3) is rejected
    val b = AudioMeta.wavFixture(44100, 2, 16, 10)
    b(20) = 3
    assert(AudioMeta.parse(b) == null)
    // a truncated fixture is unrecognized
    assert(AudioMeta.parse(AudioMeta.wavFixture(44100, 2, 16, 10).take(43)) == null)
  }
}
