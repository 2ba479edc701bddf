package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint (SURVEY.md §7.4 extension:
  * winnowing-style content fingerprinting for near-dup detection).
  *
  * The fingerprint is the MINIMUM polynomial hash over all `W`-char
  * windows of the text — the 1-fingerprint degenerate of the winnowing
  * scheme: identical for any pair of documents sharing their minimal
  * window, robust to edits outside it. The O(n) rolling update
  * (H' = (H − c_out·B^{W−1})·B + c_in mod M) is why this is a custom
  * expression instead of SQL: a declarative formulation is O(n·W).
  * Codegen'd via a static helper call so scan→fingerprint stays one
  * whole-stage span. null when the text is shorter than the window.
  */
object RollingHash {
  val B = 257L
  val M = 1000000007L

  /** min over all w-windows of the polynomial hash; null if len < w.
    * ASCII-safe (operates on UTF-16 code units — identical to code points
    * for the BMP text this engine fingerprints). */
  def minWindowHash(s: UTF8String, w: Int): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n < w) return null
    var bw = 1L // B^{w-1} mod M
    var j = 0
    while (j < w - 1) { bw = bw * B % M; j += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + str.charAt(i)) % M; i += 1 }
    var mn = h
    while (i < n) {
      val out = str.charAt(i - w).toLong
      val t = (h - out * bw % M + M) % M
      h = (t * B + str.charAt(i)) % M
      if (h < mn) mn = h
      i += 1
    }
    java.lang.Long.valueOf(mn)
  }
}

case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(v: Any): Any =
    RollingHash.minWindowHash(v.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("rh")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed =
            graft.plans.RollingHash.minWindowHash(${childGen.value}, $window);
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): RollingMinHashExpr =
    copy(child = c)
}
