package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{ImageMeta, ImageMetaExpr}

/** Real PNG/BMP header parsing: byte-level vectors (including a
  * hand-pinned spec-layout PNG), generator∘parser identity, rejection of
  * non-image payloads, and the expression path through Spark. */
class ImageMetaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def row(b: Array[Byte]): (String, Long, Long) = {
    val r = ImageMeta.parse(b)
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("parses a hand-assembled spec-layout PNG IHDR (big-endian dims)") {
    // 8-byte signature, IHDR length 13, type, width=1, height=2, then
    // depth/color/compression/filter/interlace + CRC (not checked)
    val png = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x02,
      0x08, 0x02, 0x00, 0x00, 0x00, 0x90, 0x77, 0x53, 0xde).map(_.toByte)
    assert(row(png) === (("png", 1L, 2L)))
  }

  test("parses a hand-assembled BMP info header (little-endian dims)") {
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(14) = 40   // BITMAPINFOHEADER size — required, see next vector
    bmp(18) = 0x20 // width 32 LE
    bmp(22) = 0x01; bmp(23) = 0x01 // height 257 LE
    assert(row(bmp) === (("bmp", 32L, 257L)))
  }

  test("core header rejected (16-bit dims); V5 parses (same 18/22 layout)") {
    // BITMAPCOREHEADER: size 12, 16-bit dims at 18/20 — offsets 18/22 as
    // 32-bit ints would read nonsense
    val core = new Array[Byte](54)
    core(0) = 'B'; core(1) = 'M'; core(14) = 12
    core(18) = 0x20; core(20) = 0x10
    assert(ImageMeta.parse(core) == null)
    // BITMAPV5HEADER (124) keeps 32-bit dims at 18/22 — must parse
    val v5 = new Array[Byte](140)
    v5(0) = 'B'; v5(1) = 'M'; v5(14) = 124
    v5(18) = 0x07; v5(22) = 0x05
    assert(row(v5) === (("bmp", 7L, 5L)))
  }

  test("top-down BMP (negative height) reports |height|") {
    val bmp = ImageMeta.bmpFixture(10, 20)
    // flip height to -20 little-endian
    val neg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-20).array()
    System.arraycopy(neg, 0, bmp, 22, 4)
    assert(row(bmp) === (("bmp", 10L, 20L)))
  }

  test("generator∘parser is the identity on dims (all formats, extremes)") {
    for ((w, h) <- Seq((1, 1), (16, 255), (255, 16), (4096, 2160))) {
      assert(row(ImageMeta.pngFixture(w, h)) === (("png", w.toLong, h.toLong)))
      assert(row(ImageMeta.bmpFixture(w, h)) === (("bmp", w.toLong, h.toLong)))
      for (pad <- Seq(0, 1, 16, 300))
        assert(row(ImageMeta.jpegFixture(w, h, pad)) === (("jpeg", w.toLong, h.toLong)))
    }
  }

  test("jpeg SOF is found by WALKING segments, not a fixed offset") {
    // hand-assembled: SOI, COM segment of length 5 (3 payload bytes),
    // 0xFF fill bytes before SOF0, progressive SOF2 variant, RST skipped
    def seg(m: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, m.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val sofPayload = Array[Byte](8, 0, 2, 0, 1, 1, 1, 0x11, 0) // h=2, w=1
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xfe, Array[Byte](1, 2, 3)) ++         // COM
      Array(0xff.toByte, 0x01.toByte) ++         // standalone TEM
      Array(0xff.toByte, 0xff.toByte) ++         // fill byte run start
      seg(0xc2, sofPayload)                      // progressive SOF2
    assert(row(jpg) === (("jpeg", 1L, 2L)))
    // DHT (0xC4) must NOT be mistaken for a SOF — it is skipped, and the
    // payload that follows it is the real frame header
    val withDht = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xc4, Array[Byte](0, 1, 2, 3, 4, 5, 6)) ++ seg(0xc0, sofPayload)
    assert(row(withDht) === (("jpeg", 1L, 2L)))
  }

  test("jpeg rejections: EOI/SOS before SOF, truncation, misalignment") {
    def seg(m: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, m.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val soi = Array(0xff.toByte, 0xd8.toByte)
    // EOI straight after SOI: no frame header anywhere
    assert(ImageMeta.parse(soi ++ Array(0xff.toByte, 0xd9.toByte)) === null)
    // SOS before any SOF (malformed stream)
    assert(ImageMeta.parse(soi ++ seg(0xda, Array[Byte](0))) === null)
    // truncated mid-segment and mid-SOF
    assert(ImageMeta.parse(ImageMeta.jpegFixture(9, 9, 4).take(30)) === null)
    assert(ImageMeta.parse(soi ++ seg(0xc0, Array[Byte](8, 0)).take(6)) === null)
    // misaligned: a non-FF byte where a marker must start
    assert(ImageMeta.parse(soi ++ Array[Byte](0x12, 0x34)) === null)
  }

  test("png fixture carries a correct IHDR CRC32") {
    val b = ImageMeta.pngFixture(100, 200)
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(b, 29, 4).getInt
    assert(stored === crc.getValue.toInt)
  }

  test("non-image and truncated payloads are rejected as null") {
    assert(ImageMeta.parse("plain text".getBytes) === null)
    assert(ImageMeta.parse(Array[Byte]()) === null)
    assert(ImageMeta.parse(ImageMeta.pngFixture(5, 5).take(20)) === null)
    assert(ImageMeta.parse("BM".getBytes) === null) // too short for dims
  }

  test("image_meta runs as an expression through Spark (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (1L, ImageMeta.pngFixture(640, 480)),
      (2L, ImageMeta.bmpFixture(320, 240)),
      (3L, "not an image".getBytes)).toDF("id", "media")
      .select(col("id"), toCol(ImageMetaExpr(toExpr(col("media")))).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq === Seq((1L, "png"), (2L, "bmp"), (3L, null)))
    val dims = df.filter(col("id") === 1).collect()(0)
    assert(dims.getLong(2) === 640L && dims.getLong(3) === 480L)
  }
}
