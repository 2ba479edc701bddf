package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual image hash (pHash) over REAL pixel bytes — the image-dedup
  * primitive of a multimodal training-data pipeline (near-duplicate images
  * survive resampling/compression noise that defeats exact byte hashes).
  *
  * Pipeline: a 16×16 grayscale frame → 2-D DCT-II → the SIGN of the 63
  * lowest-frequency coefficients (the 8×8 top-left block minus the DC
  * term) packed into bits 0..62 of a non-negative Long. Low-frequency
  * signs are stable under small pixel perturbations, so near-identical
  * images land within a small hamming distance — the classic pHash
  * construction with a sign threshold in place of the median split (the
  * same simplification `dd_simhash` uses: a sign is exactly reproducible
  * in integer arithmetic, a median of 64 values needs an order statistic
  * on both engines).
  *
  * Cross-engine exactness: the DCT basis is NOT recomputed per engine —
  * [[Phash.Ct]] holds cos(π(2x+1)u/32) rounded to 4 decimals as integer
  * literals, rendered once from StrictMath into both the JVM table and the
  * oracle's SQL list ([[Phash.CtSql]]), so there is no libm-vs-libm drift
  * by construction. Every coefficient is then an exact int64 sum
  * (|coef| ≤ 255·10^4·10^4·256 ≈ 6.5·10^12).
  *
  * The CONTAINER leg is real, like ImageMeta: [[Phash.bmpPixelFixture]]
  * writes a byte-faithful 16×16 24-bpp BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER + bottom-up BGR rows, the real stride rules), and
  * [[PhashExpr]] parses the actual bytes back — magic, pixel-array offset
  * read from the header (not assumed), bottom-up row order, (b+g+r)/3
  * gray. The gray FORMULA is deterministic from doc_id (md5-derived base
  * per 4-doc cluster + a sparse per-variant perturbation — a stand-in for
  * a real photo store, the mm_* fixture discipline), so the oracle can pin
  * generator∘parser∘hash = identity: a parser that misreads the stride,
  * the row order, or the pixel offset diverges loudly.
  */
object Phash extends Serializable {

  val Dim = 16
  val CoefDim = 8

  /** integer DCT basis: Ct(u)(x) = round(cos(π(2x+1)u/32)·10^4). */
  val Ct: Array[Array[Long]] = Array.tabulate(CoefDim, Dim) { (u, x) =>
    math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2 * Dim)) * 10000.0)
  }

  /** the SAME table as a DuckDB list literal (flattened, index u·16+x+1). */
  val CtSql: String = "[" + Ct.flatten.mkString(", ") + "]"

  /** md5-derived base gray of a cluster's image at linear position pos. */
  def grayBase(cluster: Long, pos: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$cluster:$pos".getBytes("US-ASCII"))
    hex(0) & 0xff
  }

  /** gray(doc, x, y): the cluster base (cluster = doc_id div 4) plus a
    * sparse +16 perturbation on variants 1-3 — calibrated so intra-cluster
    * phash hamming lands ≤ 4 and inter-cluster ≥ ~19. */
  def grayAt(doc: Long, x: Int, y: Int): Int = {
    val v = (doc % 4).toInt
    val pos = y * Dim + x
    val b = grayBase(doc / 4, pos)
    if (v > 0 && (pos + v) % 29 == 0) math.min(b + 16, 255) else b
  }

  /** a byte-faithful 16×16 24-bpp BMP carrying the doc's gray frame:
    * 54-byte headers + 16 bottom-up rows × 48-byte stride (16·3, already
    * 4-aligned), r=g=b=gray. 822 bytes. */
  def bmpPixelFixture(doc: Long): Array[Byte] = {
    val stride = Dim * 3
    val out = java.nio.ByteBuffer.allocate(54 + stride * Dim)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + stride * Dim)
    out.putInt(0).putInt(54)
    out.putInt(40)
    out.putInt(Dim).putInt(Dim)
    out.putShort(1.toShort).putShort(24.toShort)
    out.position(54)
    var r = 0
    while (r < Dim) {
      val y = Dim - 1 - r // bottom-up: stored row r is image row 15-r
      var x = 0
      while (x < Dim) {
        val g = grayAt(doc, x, y).toByte
        out.put(g).put(g).put(g) // B, G, R
        x += 1
      }
      r += 1
    }
    out.array()
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** parse a 16×16 24-bpp bottom-up BMP and hash it; null (as boxed Long)
    * for anything else — wrong magic, wrong dims/bpp, top-down rows, or a
    * pixel array that overruns the payload. */
  def phash(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = leInt(b, 10)
    val w = leInt(b, 18)
    val h = leInt(b, 22)
    val bpp = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    if (w != Dim || h != Dim || bpp != 24) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * Dim > b.length) return null
    val g = Array.ofDim[Long](Dim * Dim)
    var y = 0
    while (y < Dim) {
      val row = off + (Dim - 1 - y) * stride
      var x = 0
      while (x < Dim) {
        val p = row + x * 3
        g(y * Dim + x) =
          ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var u = 0
    while (u < CoefDim) {
      var v = 0
      while (v < CoefDim) {
        if (u != 0 || v != 0) {
          var coef = 0L
          var yy = 0
          while (yy < Dim) {
            val cv = Ct(v)(yy)
            var xx = 0
            while (xx < Dim) {
              coef += g(yy * Dim + xx) * Ct(u)(xx) * cv
              xx += 1
            }
            yy += 1
          }
          if (coef > 0) hash |= 1L << (u * CoefDim + v - 1)
        }
        v += 1
      }
      u += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

/** `phash16(media)` → the 63-bit perceptual hash of a 16×16 24-bpp BMP
  * payload; null for unrecognized payloads. Codegen-participating, byte
  * local — the scan-side narrow map an image-dedup sweep runs per file. */
case class PhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash16"

  override def nullSafeEval(v: Any): Any = {
    val h = Phash.phash(v.asInstanceOf[Array[Byte]])
    if (h == null) null else h.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.addReferenceObj("phash", Phash, Phash.getClass.getName)
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("phBoxed")
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          java.lang.Long $boxed = $ph.phash(${c.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(c: Expression): PhashExpr =
    copy(child = c)
}
