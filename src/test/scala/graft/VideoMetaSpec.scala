package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VideoMeta

/** Byte-level vectors for the MP4/ISO-BMFF box walker. */
class VideoMetaSpec extends AnyFunSuite {

  test("generator∘parser identity, with and without a leading free box") {
    for {
      ts <- Seq(600, 1000, 90000)
      ticks <- Seq(1, 3003, 999999)
      pad <- Seq(0, 16, 1)
    } {
      val row = VideoMeta.parse(VideoMeta.mp4Fixture(ts, ticks, pad))
      assert(row != null, s"ts=$ts ticks=$ticks pad=$pad must parse")
      assert(row.getUTF8String(0).toString === "isom")
      assert(row.getLong(1) === ts.toLong)
      assert(row.getLong(2) === ticks.toLong)
      assert(row.getLong(3) === ticks.toLong * 1000000L / ts)
    }
  }

  test("malformed payloads parse to null") {
    assert(VideoMeta.parse(null) == null)
    assert(VideoMeta.parse(Array.fill[Byte](24)(0)) == null)
    // ftyp alone, no moov
    assert(VideoMeta.parse(VideoMeta.mp4Fixture(600, 10).take(16)) == null)
    // corrupt the moov size so the walk runs off the payload
    val b = VideoMeta.mp4Fixture(600, 10)
    b(16) = 0x7f // moov size high byte → size > payload
    assert(VideoMeta.parse(b) == null)
    // a version-1 mvhd (64-bit times) is explicitly out of scope → null
    val v1 = VideoMeta.mp4Fixture(600, 10)
    v1(16 + 8 + 8) = 1
    assert(VideoMeta.parse(v1) == null)
  }
}
