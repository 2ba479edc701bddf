package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.plans.AsOfJoinPlan

/** The custom as-of logical operator: the node must appear in the analyzed
  * plan, be gone after optimization (the injected rewrite fired), and
  * produce exactly what the hand-written asOfBackward produces.
  */
class AsOfPlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, 100L, "a"), (1L, 4L, 50L, "b"), (2L, 10L, 50L, "c"))
    .toDF("key", "ts", "tb", "note")
  private lazy val right = Seq(
    (1L, 5L, 1L, 500.0), (1L, 10L, 50L, 1000.0), (2L, 10L, 50L, 42.0))
    .toDF("key", "ts", "tb", "rv")

  test("AsOfJoinPlan survives analysis and is expanded by the optimizer") {
    val df = AsOf.asOfBackwardPlan(left, right, "key", "ts", "tb", "rv", "asof")
    assert(df.queryExecution.analyzed.collect { case p: AsOfJoinPlan => p }.nonEmpty,
      "node missing from analyzed plan")
    assert(df.queryExecution.optimizedPlan.collect { case p: AsOfJoinPlan => p }.isEmpty,
      "rewrite did not fire — node left in optimized plan")
  }

  test("BlockRangePlan is planned by the injected strategy into BlockRangeExec") {
    val df = org.apache.spark.sql.graftbridge.ColumnBridge
      .ofRows(spark, graft.plans.BlockRangePlan(0L, 999L, 4))
    // physical nodeName renders without the Exec suffix
    assert(df.queryExecution.executedPlan.toString.contains("BlockRange"))
    assert(df.count() === 1000L)
    assert(df.rdd.getNumPartitions === 4)
  }

  test("operator results equal the hand-written expansion") {
    val viaPlan = AsOf.asOfBackwardPlan(left, right, "key", "ts", "tb", "rv", "asof")
      .collect().map(_.toSeq).toSet
    val viaFn = AsOf.asOfBackward(left, right, "key", "ts", "tb", "rv", "asof")
      .collect().map(_.toSeq).toSet
    assert(viaPlan === viaFn)
    assert(viaPlan.size === 3)
  }
}
