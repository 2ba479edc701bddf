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

object Winnow {
  /** full winnowing fingerprint set (the MOSS scheme): the minimum hash of
    * every `k`-window over the `w`-char rolling hashes, distinct and
    * ascending (canonical for set compare). Documents shorter than `w`
    * chars yield null; with `<= k` hashes the whole doc is one window.
    * Guarantee: two docs sharing a contiguous run of ≥ w+k-1 chars share
    * at least one fingerprint. O(n·k) here (n ≈ 300 at test scale; the
    * O(n) monotonic-deque variant drops in behind the same signature). */
  def fingerprints(s: UTF8String, w: Int, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n < w) return null
    val m = n - w + 1
    val hs = new Array[Long](m)
    var bw = 1L
    var j = 0
    while (j < w - 1) { bw = bw * RollingHash.B % RollingHash.M; j += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * RollingHash.B + str.charAt(i)) % RollingHash.M; i += 1 }
    hs(0) = h
    while (i < n) {
      val t = (h - str.charAt(i - w).toLong * bw % RollingHash.M + RollingHash.M) % RollingHash.M
      h = (t * RollingHash.B + str.charAt(i)) % RollingHash.M
      hs(i - w + 1) = h
      i += 1
    }
    val mins =
      if (m <= k) Array(hs.min)
      else (0 to m - k).map(st => { // min per k-window
        var mn = hs(st); var x = st + 1
        while (x < st + k) { if (hs(x) < mn) mn = hs(x); x += 1 }
        mn
      }).toArray
    val out = mins.distinct.sorted
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** array-of-fingerprints winnowing expression (input StringType). */
case class WinnowExpr(child: Expression, window: Int, winnowK: Int)
    extends UnaryExpression {
  require(window > 0 && winnowK > 0)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    Winnow.fingerprints(v.asInstanceOf[UTF8String], window, winnowK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("fps")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            graft.plans.Winnow.fingerprints(${childGen.value}, $window, $winnowK);
          if ($arr != null) {
            ${ev.isNull} = false;
            ${ev.value} = $arr;
          }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
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
