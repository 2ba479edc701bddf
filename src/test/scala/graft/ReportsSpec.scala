package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants for the report-analytics family: OHLC bars, cohort retention,
  * median/MAD outliers. The exact-value gate is the DuckDB oracle; these
  * specs pin the structural properties a refactor could silently break.
  */
class ReportsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a8_ohlc: candle geometry holds and volume accounts for every purchase") {
    val rows = QueryRegistry.byName("a8_ohlc").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= h)
      assert(o >= l && o <= h, s"open outside [low,high] on ${r.get(0)}")
      assert(c >= l && c <= h, s"close outside [low,high] on ${r.get(0)}")
      val vwap = r.getAs[Double]("vwap")
      assert(vwap >= l && vwap <= h)
    }
    val purchases = graft.core.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.map(_.getAs[Long]("volume")).sum === purchases)
  }

  test("a9_cohort_retention: offset-0 is the cohort size and retention never exceeds it") {
    val rows = QueryRegistry.byName("a9_cohort_retention").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.get(0))
    byCohort.foreach { case (cm, rs) =>
      val base = rs.find(_.getAs[Long]("month_offset") == 0L)
        .map(_.getAs[Long]("n_custs"))
      assert(base.isDefined, s"cohort $cm missing its offset-0 row")
      assert(rs.forall(_.getAs[Long]("n_custs") <= base.get),
        s"cohort $cm: retained users exceed the cohort size")
      assert(rs.forall(_.getAs[Long]("month_offset") >= 0L))
    }
    // cohort sizes partition the customer base
    val custs = graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    val sumBases = byCohort.values
      .map(_.find(_.getAs[Long]("month_offset") == 0L).get.getAs[Long]("n_custs"))
      .sum
    assert(sumBases === custs)
  }

  test("a10_funnel: stage counts are monotone non-increasing from a full base") {
    val rows = QueryRegistry.byName("a10_funnel").fn(spark, sf).collect()
    assert(rows.length === 3)
    val ns = rows.sortBy(_.getAs[Int]("stage")).map(_.getAs[Long]("n_users"))
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a },
      s"funnel must narrow: ${ns.mkString(",")}")
    assert(ns.head > 0, "stage 1 must have users at sf0.001")
  }

  test("a7_anomaly_mad: flagged rows sit strictly beyond 3.5 MAD and are a minority") {
    val rows = QueryRegistry.byName("a7_anomaly_mad").fn(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("adev") > 3.5 * r.getAs[Double]("mad"))
    }
    val total = graft.core.Tables.events(spark, sf).count()
    assert(rows.length < total / 10, "MAD gate should flag a small tail, not the bulk")
    assert(rows.nonEmpty, "sf0.01 events are known to contain heavy-value outliers")
  }
}
