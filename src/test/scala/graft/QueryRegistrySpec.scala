package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class QueryRegistrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("registry names are unique and every query has a column set") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every registered query runs at sf0.001 and its schema is stable") {
    QueryRegistry.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
    }
  }

  test("page-size clamp snaps to the allowed set (lib_tools getPagination)") {
    import graft.operators.Api.clampPageSize
    assert(clampPageSize(20) === 20)
    assert(clampPageSize(25) === 20)
    assert(clampPageSize(40) === 40)
    assert(clampPageSize(500) === 40)
    assert(clampPageSize(1) === 20) // below minimum → default
  }

  test("approx distinct-actives lands within 5% of the exact count") {
    val approx = QueryRegistry.byName("a1b_approx_distinct").fn(spark, sf)
      .collect()(0).getLong(0).toDouble
    val exact = QueryRegistry.byName("a1_distinct_users").fn(spark, sf)
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("flagship q1_agg returns the 6 flag/status groups with positive sums") {
    val rows = QueryRegistry.byName("q1_agg").fn(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }
}
