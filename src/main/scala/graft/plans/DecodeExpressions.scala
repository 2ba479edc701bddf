package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** EVM log-word decoding — the one genuinely custom scalar in the
  * reference's pipeline (SURVEY.md §2.10 X1: `_decode_logs`,
  * scan_events_txs.py:144 dispatches keccak-topic0 → ABI word decode).
  *
  * An ABI word is a 32-byte big-endian value rendered as hex; numeric
  * fields fit a long once the protocol bounds them. `HexToLongExpr`
  * parses one hex word (optional 0x prefix) to a long — implemented as a
  * native Catalyst expression WITH `doGenCode`, so it participates in
  * whole-stage codegen and never breaks a fused scan→project pipeline
  * (a Scala UDF here would box every row and fence off codegen).
  * Malformed or >64-bit input yields null (Spark cast-style leniency),
  * never an exception.
  */
object HexDecode {
  /** runtime helper shared by eval and generated code */
  def parse(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    var t = s.toString.trim
    if (t.length >= 2 && t.charAt(0) == '0' && (t.charAt(1) == 'x' || t.charAt(1) == 'X'))
      t = t.substring(2)
    if (t.isEmpty || t.length > 16) return null
    try java.lang.Long.valueOf(java.lang.Long.parseUnsignedLong(t, 16))
    catch { case _: NumberFormatException => null }
  }
}

/** Input must be a StringType column (callers in graft.functions construct
  * it so; ExpectsInputTypes is private[sql] in Spark 4, hence no
  * declarative input check here). */
case class HexToLongExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_to_long"

  override def nullSafeEval(v: Any): Any =
    HexDecode.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.plans.HexDecode.parse(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): HexToLongExpr = copy(c)
}
