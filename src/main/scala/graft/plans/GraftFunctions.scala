package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL surface for the engine's custom Catalyst expressions: `hex_to_long`,
  * `rolling_min_hash`, `wei_to_dec`, `trunc_wei`, `exact_mul`, `int_dot` become
  * callable from `spark.sql(...)` — a user of the reference switching to
  * this library keeps a pure-SQL workflow for the custom scalar layer.
  *
  * Two registration paths, same builders:
  *  - `GraftFunctions.register(spark)` on an existing session;
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the `SparkSessionExtensions.injectFunction` path).
  */
object GraftFunctions {

  private def one(name: String)(f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[HexToLongExpr].getName, name),
      { args: Seq[Expression] =>
        require(args.length == 1, s"$name expects 1 argument")
        f(args.head)
      })

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[ExactMulExpr].getName, name),
      { args: Seq[Expression] =>
        require(args.length == 2, s"$name expects 2 arguments")
        f(args(0), args(1))
      })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one("hex_to_long")(HexToLongExpr(_)),
    two("rolling_min_hash") { (text, w) =>
      val window = w match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"rolling_min_hash window must be an int literal, got $other")
      }
      RollingMinHashExpr(text, window)
    },
    one("wei_to_dec")(e => WeiToDecExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.DecimalType(38, 0)))),
    one("trunc_wei")(TruncWeiExpr(_)),
    two("exact_mul")(ExactMulExpr(_, _)),
    two("int_dot")(IntDotExpr(_, _)),
    one("bpe_encode")(BpeEncodeExpr(_)),
    (FunctionIdentifier("decode_log"),
      new ExpressionInfo(classOf[DecodeLogExpr].getName, "decode_log"),
      { args: Seq[Expression] =>
        require(args.length == 3, "decode_log expects (event_name, topics, data)")
        val event = args.head match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"decode_log event name must be a string literal, got $other")
        }
        require(LogSchemaRegistry.byName.contains(event), s"unknown event $event")
        DecodeLogExpr(event, args(1), args(2))
      }))

  /** register on an already-built session. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, b) =>
    ColumnBridge.registerFunction(spark, id.funcName, info, b)
  }
}

/** `spark.sql.extensions` entry point: the SQL function surface plus the
  * as-of join macro-operator rewrite (AsOfJoinPlan → single-shuffle
  * merge-sweep expansion). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => AsOfJoinRewrite)
    ext.injectPlannerStrategy(_ => BlockRangeStrategy)
  }
}
