package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact wei fixed-point arithmetic as custom Catalyst expressions.
  *
  * Why custom: Spark's decimal binary-op typing (`allowPrecisionLoss`
  * precision adjustment) silently reduces result scale when nominal
  * precision exceeds 38 — e.g. Decimal(38,0)/1e18 comes back at scale 6 and
  * Decimal(38,18)*1e18 rounds before a floor can see the digits. The
  * reference's semantics (Python arbitrary-precision int/Decimal,
  * `indexer/events/mocexchange.py:46-89`: `fromWei` exact division,
  * `int(d*10**18)` truncation toward zero) need the full 36 fractional
  * digits until the final truncation. These expressions do the arithmetic
  * on java BigDecimal exactly and only then fix the output scale.
  *
  * All are null-safe (null in → null out) and deterministic; CodegenFallback
  * is acceptable because they sit at event-derivation boundaries, not in
  * scan-heavy hot loops (and each is O(1) per row).
  */

/** wei integer → ether-scale decimal: exact x / 10^18 → Decimal(38,18). */
case class WeiToDecExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(38, 18)
  override protected def nullSafeEval(v: Any): Any = {
    val bd = v.asInstanceOf[Decimal].toJavaBigDecimal
    Decimal(bd.movePointLeft(18), 38, 18)
  }
  override protected def withNewChildInternal(c: Expression): WeiToDecExpr = copy(c)
  override def prettyName: String = "wei_to_dec"
}

/** ether-scale decimal → wei integer with Python-int truncation toward
  * zero: trunc(x * 10^18) → Decimal(38,0). */
case class TruncWeiExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(38, 0)
  override protected def nullSafeEval(v: Any): Any = {
    val bd = v.asInstanceOf[Decimal].toJavaBigDecimal
    Decimal(bd.movePointRight(18).setScale(0, RoundingMode.DOWN), 38, 0)
  }
  override protected def withNewChildInternal(c: Expression): TruncWeiExpr = copy(c)
  override def prettyName: String = "trunc_wei"
}

/** exact decimal product, truncated (toward zero) only at scale 20 — finer
  * than the scale-18 trunc, so a later TruncWeiExpr sees the exact value:
  * toward-zero truncation at a finer scale composes with toward-zero
  * truncation at a coarser one. Output Decimal(38,20), leaving 18 integer
  * digits (covers usd products up to 10^18 — e.g. 10^13 ether × 10^5
  * price). Beyond that the product returns null, matching Spark's own
  * decimal-op overflow behavior (the reference's Python Decimal never
  * overflows; null is the documented engine bound, not an exception). */
case class ExactMulExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(38, 20)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = a.asInstanceOf[Decimal].toJavaBigDecimal
      .multiply(b.asInstanceOf[Decimal].toJavaBigDecimal)
      .setScale(20, RoundingMode.DOWN)
    if (r.precision > 38) null else Decimal(r, 38, 20)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExactMulExpr =
    copy(l, r)
  override def prettyName: String = "exact_mul"
}
