package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-container header parsing (replacing round-3's synthetic
  * decode stub): width/height/format are read from the actual public byte
  * layouts —
  *
  *  - PNG (RFC 2083 / W3C spec): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *    then the IHDR chunk (4-byte big-endian length = 13, ASCII "IHDR",
  *    4-byte big-endian width at offset 16, height at offset 20, CRC32 over
  *    type+data);
  *  - BMP (Windows BITMAPINFOHEADER): ASCII "BM", 4-byte little-endian file
  *    size at offset 2, pixel-data offset at 10, 40-byte info header whose
  *    4-byte little-endian width sits at offset 18 and height at 22 (height
  *    may be negative for top-down rows — dimensions report |height|);
  *  - JPEG (ITU-T T.81 §B): SOI `FF D8`, then a WALKED marker-segment list
  *    (each `FF xx` + 2-byte big-endian length including itself; APPn/COM/
  *    DQT/DHT skipped by length, 0xFF fill bytes and standalone TEM/RSTn
  *    tolerated) until a start-of-frame marker (0xC0-0xCF minus DHT 0xC4,
  *    JPG 0xC8, DAC 0xCC) — whose payload carries precision(1), big-endian
  *    height(2) then width(2). Dimensions CANNOT be read at a fixed offset
  *    (APP1/EXIF blocks are variable-length), which is exactly what the
  *    fixture's doc_id-sized APP1 pad exercises; hitting SOS/EOI without a
  *    SOF, a stuffed 0x00, misalignment, or a truncation rejects (null).
  *
  * The decode runs as a codegen-participating Catalyst expression over the
  * `binary` media column — a narrow map, no shuffle, no UDF — exactly the
  * plumbing a 100 TB multimodal scan needs (a full pixel decode would slot
  * in behind the same expression with a per-partition codec). The pixel
  * payload itself is out of scope in this environment (no codec libs); the
  * header fixtures [[ImageMeta.pngFixture]]/[[ImageMeta.bmpFixture]] write
  * byte-faithful container headers (including the real IHDR CRC32), so the
  * parser is exercised against the true formats end to end
  * (`mm_decode_meta` oracle + ImageMetaSpec vectors).
  */
object ImageMeta extends Serializable {

  /** a minimal byte-faithful PNG: signature + a correct IHDR chunk
    * (bit depth 8, truecolor, CRC32 over type+data). 33 bytes. */
  def pngFixture(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33) // big-endian by default
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(out.array(), 12, 17) // "IHDR" + 13 data bytes
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** a minimal byte-faithful BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
    * (24bpp, pixel data would start at offset 54). 54 bytes. */
  def bmpFixture(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + width * height * 3) // file size
    out.putInt(0).putInt(54)            // reserved, pixel offset
    out.putInt(40)                      // info header size
    out.putInt(width).putInt(height)
    out.putShort(1.toShort).putShort(24.toShort) // planes, bpp
    // compression, image size, ppm×2, palette counts — zeros
    out.array()
  }

  /** a byte-faithful JPEG header prefix: SOI, APP0/JFIF, an APP1 segment
    * of `pad` deterministic payload bytes (the variable-length EXIF stand-
    * in that defeats fixed-offset peeks), one DQT, then SOF0 with the real
    * big-endian height/width. 112 + pad bytes. */
  def jpegFixture(width: Int, height: Int, pad: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(112 + pad) // big-endian
    out.put(0xff.toByte).put(0xd8.toByte)                    // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16)       // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.put(1.toByte).put(1.toByte).put(0.toByte)            // v1.1, no units
    out.putShort(1).putShort(1).put(0.toByte).put(0.toByte)  // density, thumb
    out.put(0xff.toByte).put(0xe1.toByte).putShort((pad + 2).toShort) // APP1
    (0 until pad).foreach(i => out.put(((i * 31 + 7) & 0xff).toByte))
    out.put(0xff.toByte).put(0xdb.toByte).putShort(67)       // DQT, len 67
    out.put(0.toByte)                                        // table id
    (0 until 64).foreach(i => out.put(((i * 13 + 1) & 0xff).toByte))
    out.put(0xff.toByte).put(0xc0.toByte).putShort(17)       // SOF0, len 17
    out.put(8.toByte)                                        // precision
    out.putShort(height.toShort).putShort(width.toShort)
    out.put(3.toByte)                                        // 3 components
    out.put(1.toByte).put(0x22.toByte).put(0.toByte)
    out.put(2.toByte).put(0x11.toByte).put(1.toByte)
    out.put(3.toByte).put(0x11.toByte).put(1.toByte)
    out.array()
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** parse a PNG or BMP header → (format, width, height); null if the
    * payload is neither (truncated counts as unrecognized). */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    if (b.length >= 24 && b.startsWith(PngSig)
        && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      InternalRow(UTF8String.fromString("png"),
        beInt(b, 16).toLong, beInt(b, 20).toLong)
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M'
        && leInt(b, 14) >= 40) {
      // every DIB header of size >= 40 (INFOHEADER 40, V2/V3 52/56,
      // BITMAPV4 108, BITMAPV5 124) keeps 32-bit width/height at offsets
      // 18/22; only the 12-byte BITMAPCOREHEADER stores 16-bit dims there
      // and must not parse to garbage
      InternalRow(UTF8String.fromString("bmp"),
        leInt(b, 18).toLong, math.abs(leInt(b, 22)).toLong)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk the marker-segment list to the first start-of-frame
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // marker misalignment
        var j = i
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return null
        val m = b(j) & 0xff
        if (m == 0x00) return null // stuffed byte outside a scan
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 1 // standalone TEM / RSTn: no length field
        } else if (m == 0xd9 || m == 0xda) {
          return null // EOI / SOS without any SOF: no frame header
        } else {
          if (j + 2 >= b.length) return null
          val len = ((b(j + 1) & 0xff) << 8) | (b(j + 2) & 0xff)
          if (len < 2) return null
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (len < 7 || j + 7 >= b.length) return null // truncated SOF
            return InternalRow(UTF8String.fromString("jpeg"),
              (((b(j + 6) & 0xff) << 8) | (b(j + 7) & 0xff)).toLong,
              (((b(j + 4) & 0xff) << 8) | (b(j + 5) & 0xff)).toLong)
          }
          i = j + 1 + len
        }
      }
      null
    } else null
  }
}

/** `image_meta(media)` → struct<format, width, height> from real
  * PNG/BMP/JPEG header bytes; null for unrecognized payloads.
  * Codegen-participating. */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def nullSafeEval(v: Any): Any =
    ImageMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meta = ctx.addReferenceObj("imageMeta", ImageMeta, ImageMeta.getClass.getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = $meta.parse(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(c: Expression): ImageMetaExpr =
    copy(child = c)
}
