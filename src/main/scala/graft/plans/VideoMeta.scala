package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL video-container header parsing — the third multimodal leg beside
  * [[ImageMeta]] (image) and [[AudioMeta]] (audio): MP4 / ISO-BMFF
  * (ISO/IEC 14496-12). The format is a tree of length-prefixed boxes
  * (4-byte big-endian size including the 8-byte header, then a 4-char
  * type); the parser WALKS the top-level sequence to `moov`, then walks
  * its children to `mvhd` (movie header, version 0: timescale is the
  * big-endian 32-bit at box offset 20, duration-in-ticks at 24) — real
  * box-tree traversal, not a fixed-offset peek, so fixtures with extra
  * leading boxes (`free`) parse identically. duration_us =
  * ticks·10⁶ / timescale is exact integer arithmetic.
  */
object VideoMeta extends Serializable {

  private def putBox(bb: java.nio.ByteBuffer, size: Int, typ: String): Unit = {
    bb.putInt(size); bb.put(typ.getBytes("US-ASCII"))
  }

  /** byte-faithful minimal MP4: `ftyp` (major brand isom) + optional
    * `free` padding box + `moov` containing a version-0 `mvhd`. */
  def mp4Fixture(timescale: Int, durationTicks: Int, freePad: Int = 0): Array[Byte] = {
    val freeSz = if (freePad > 0) 8 + freePad else 0
    val out = java.nio.ByteBuffer.allocate(16 + freeSz + 8 + 108) // big-endian
    putBox(out, 16, "ftyp")
    out.put("isom".getBytes("US-ASCII")).putInt(0)
    if (freePad > 0) {
      putBox(out, freeSz, "free")
      out.put(Array.fill[Byte](freePad)(0))
    }
    putBox(out, 8 + 108, "moov")
    putBox(out, 108, "mvhd")
    out.putInt(0)                       // version 0 + flags
    out.putInt(0).putInt(0)             // creation, modification
    out.putInt(timescale).putInt(durationTicks)
    out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort) // rate, volume, reserved
    out.putInt(0).putInt(0)             // reserved
    for (v <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)) out.putInt(v) // matrix
    for (_ <- 0 until 6) out.putInt(0)  // pre_defined
    out.putInt(2)                       // next_track_ID
    out.array()
  }

  private def beInt(b: Array[Byte], off: Int): Long =
    (((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL))

  private def typ(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "US-ASCII")

  /** walk [from, to) for a box of type `want`; returns its offset or -1.
    * A size < 8 (malformed; size=0 "to end" and size=1 "64-bit largesize"
    * are out of scope for the canonical fixture layout) stops the walk. */
  private def findBox(b: Array[Byte], from: Int, to: Int, want: String): Int = {
    var off = from
    while (off + 8 <= to) {
      val size = beInt(b, off)
      if (size < 8 || off + size > to) return -1
      if (typ(b, off) == want) return off
      off += size.toInt
    }
    -1
  }

  /** parse an MP4 header; null for unrecognized payloads. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 24) return null
    if (typ(b, 0) != "ftyp" || beInt(b, 0) < 16) return null
    val brand = new String(b, 8, 4, "US-ASCII")
    val moov = findBox(b, 0, b.length, "moov")
    if (moov < 0) return null
    val moovEnd = moov + beInt(b, moov).toInt
    val mvhd = findBox(b, moov + 8, moovEnd, "mvhd")
    if (mvhd < 0 || b(mvhd + 8) != 0) return null // version-0 only
    val timescale = beInt(b, mvhd + 20)
    val ticks = beInt(b, mvhd + 24)
    if (timescale <= 0) return null
    InternalRow(UTF8String.fromString(brand), timescale, ticks,
      ticks * 1000000L / timescale)
  }
}

/** `video_meta(media)` → struct<brand, timescale, duration_ticks,
  * duration_us> from real MP4/ISO-BMFF box headers; null otherwise. */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("duration_us", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override def nullSafeEval(v: Any): Any =
    VideoMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meta = ctx.addReferenceObj("videoMeta", VideoMeta, VideoMeta.getClass.getName)
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

  override protected def withNewChildInternal(c: Expression): VideoMetaExpr =
    copy(child = c)
}
