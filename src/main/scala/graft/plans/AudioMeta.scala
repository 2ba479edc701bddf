package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** REAL audio-container header parsing — the audio leg of the multimodal
  * family, same discipline as [[ImageMeta]]: the canonical 44-byte WAV/RIFF
  * PCM header (Microsoft/IBM RIFF spec, all multi-byte fields
  * little-endian) —
  *
  *   offset 0  "RIFF", 4 chunk size, 8 "WAVE",
  *   offset 12 "fmt ", 16 subchunk size (16 for PCM), 20 audio format
  *   (1 = PCM), 22 channels, 24 sample rate, 28 byte rate, 32 block align,
  *   34 bits per sample, 36 "data", 40 data size.
  *
  * The parse emits (channels, sample_rate, bits, n_samples, duration_us);
  * n_samples = data_size / block_align and duration_us =
  * n_samples·10⁶ / rate are exact integer arithmetic, so the
  * generator∘parser identity oracle compares bitwise. Codegen-participating
  * narrow map, no UDF; the PCM payload decode slots in behind the same
  * expression with a per-partition codec (out of scope here — no codec
  * libs in the environment).
  */
object AudioMeta extends Serializable {

  /** byte-faithful canonical PCM WAV header (44 bytes, no payload —
    * data_size describes the samples that WOULD follow, like the BMP
    * fixture's file-size field). */
  def wavFixture(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort)
    out.putInt(rate).putInt(rate * blockAlign)
    out.putShort(blockAlign.toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    out.array()
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** parse a canonical PCM WAV header; null for unrecognized payloads. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE") ||
      !ascii(b, 12, "fmt ") || leShort(b, 20) != 1) return null
    val channels = leShort(b, 22)
    val rate = leInt(b, 24)
    val bits = leShort(b, 34)
    val blockAlign = leShort(b, 32)
    if (channels <= 0 || rate <= 0 || blockAlign <= 0 ||
      !ascii(b, 36, "data")) return null
    val nSamples = (leInt(b, 40).toLong & 0xffffffffL) / blockAlign
    InternalRow(channels.toLong, rate.toLong, bits.toLong, nSamples,
      nSamples * 1000000L / rate)
  }
}

/** `audio_meta(media)` → struct<channels, sample_rate, bits, n_samples,
  * duration_us> from real WAV/RIFF header bytes; null otherwise. */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("bits", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_us", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def nullSafeEval(v: Any): Any =
    AudioMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meta = ctx.addReferenceObj("audioMeta", AudioMeta, AudioMeta.getClass.getName)
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

  override protected def withNewChildInternal(c: Expression): AudioMetaExpr =
    copy(child = c)
}
