package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** asOfBackward unit vectors: schema asymmetry (right lacks left payload),
  * deterministic tie handling via the __side ordering, and the
  * inclusive/exclusive contract on exact (ts, tiebreak) ties.
  */
class AsOfSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // left has a payload column ("note") absent from right; right has its own
  // value column. ts collisions included on purpose.
  private lazy val left = Seq(
    (1L, 10L, 100L, "a"), // after right rows at ts<=10
    (2L, 10L, 50L, "b"),  // ties right row (ts=10, tb=50)
    (3L, 5L, 10L, "c"),   // before any right row except ts=5
    (4L, 99L, 1L, "d")    // after everything
  ).toDF("key", "ts", "tb", "note")

  private lazy val right = Seq(
    (1L, 5L, 1L, 500.0),
    (1L, 10L, 50L, 1000.0),
    (1L, 20L, 2L, 2000.0),
    (2L, 10L, 50L, 42.0),
    (3L, 6L, 1L, 600.0),
    (4L, 98L, 7L, 9800.0)
  ).toDF("key", "ts", "tb", "rv")

  test("inclusive as-of picks latest right row at-or-before (ts, tb)") {
    val got = AsOf.asOfBackward(left, right, "key", "ts", "tb", "rv", "asof")
      .select(col("key"), col("asof")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L) === Some(1000.0)) // ts=10 right row included (<= contract)
    assert(got(2L) === Some(42.0))   // exact (ts, tb) tie -> right included
    assert(got(3L) === None)         // right ts=6 is after left ts=5
    assert(got(4L) === Some(9800.0))
  }

  test("exclusive as-of drops all right rows tying on ts") {
    val got = AsOf.asOfBackward(left, right, "key", "ts", "tb", "rv", "asof",
        inclusive = false)
      .select(col("key"), col("asof")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L) === Some(500.0))  // right (10,50) excluded: shares ts=10
    assert(got(2L) === None)         // exact tie excluded under strict-before
    assert(got(4L) === Some(9800.0))
  }

  test("left payload and row count are preserved") {
    val out = AsOf.asOfBackward(left, right, "key", "ts", "tb", "rv", "asof")
    assert(out.count() === 4)
    assert(out.columns.toSeq === Seq("key", "ts", "tb", "note", "asof"))
  }
}
