package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants for the scale-engineering family (ScaleOps): the properties
  * each operator promises at ANY data size, checked on the sf0.001 slice.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gr_pagerank: top-20, ranks positive, sorted, floor = teleport base") {
    val rows = QueryRegistry.byName("gr_pagerank").fn(spark, sf).collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.toSeq === ranks.sortBy(-_).toSeq, "output must be rank-descending")
    // every rank = base + damped inflow, so strictly above the teleport floor
    assert(ranks.forall(_ > 0))
    // ids are namespaced: entity_key recovers the raw key for both kinds
    rows.foreach { r =>
      val id = r.getAs[Long]("node_id")
      val kind = r.getAs[String]("kind")
      assert((id % 2 == 0) == (kind == "cust"))
      assert(r.getAs[Long]("entity_key") === id / 2)
    }
  }

  test("gr_pagerank is deterministic across runs (integer fixpoint)") {
    val a = QueryRegistry.byName("gr_pagerank").fn(spark, sf).collect().toSeq
    val b = QueryRegistry.byName("gr_pagerank").fn(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("gr_triangles edge build: the grouped in-row pair expansion equals " +
    "the orderkey self-join it replaced (round-15 re-cut)") {
    // the round-15 optimization swapped gr_triangles' e0 construction from
    // a distinct + self-join (two extra corpus exchanges) to one
    // collect_set aggregation + in-row expansion; this pins set equality
    // of the support-filtered edge sets the two formulations produce
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val co = li.distinct()
    val oldE0 = co.as("a").join(co.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).drop("w")
    val newE0 = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> filter(transform(ps, y -> struct(x AS u, y AS v)), p -> p.u < p.v)))"))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).drop("w")
    assert(newE0.count() === oldE0.count())
    assert(newE0.join(oldE0, Seq("u", "v"), "left_anti").count() === 0L)
    assert(oldE0.join(newE0, Seq("u", "v"), "left_anti").count() === 0L)
  }

  test("lo_zorder: files cover the corpus and each file spans ≤ a quarter of both dims") {
    val ev = graft.core.Tables.events(spark, sf)
    val total = ev.count()
    val Row(minU: Long, maxU: Long, minT: Long, maxT: Long) = ev.agg(
      min(col("user_id")), max(col("user_id")),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    def bx(u: Long) = (u - minU) * 256 / (maxU - minU + 1)
    def by(t: Long) = (t - minT) * 256 / (maxT - minT + 1)
    val out = QueryRegistry.byName("lo_zorder").fn(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    out.foreach { r =>
      // file = top-2 bits of each dimension fixed → per-file bucket span < 64
      assert(bx(r.getAs[Long]("min_uid")) / 64 === bx(r.getAs[Long]("max_uid")) / 64,
        s"file ${r.getAs[Long]("file_id")} crosses a user_id quadrant")
      def micros(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val tMin = micros(r.getAs[java.sql.Timestamp]("min_ts"))
      val tMax = micros(r.getAs[java.sql.Timestamp]("max_ts"))
      assert(by(tMin) / 64 === by(tMax) / 64,
        s"file ${r.getAs[Long]("file_id")} crosses a time quadrant")
    }
  }

  test("tx_weighted_sample: k rows, ascending race keys, weights from n_chars") {
    val rows = QueryRegistry.byName("tx_weighted_sample").fn(spark, sf).collect()
    assert(rows.length === 10)
    val keys = rows.map(_.getAs[Long]("rkey"))
    assert(keys.toSeq === keys.sorted.toSeq)
    assert(keys.distinct.length === keys.length, "min-hash race keys must be unique")
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rnk") === i + 1)
      val w = r.getAs[Long]("weight")
      val expected = math.min(math.ceil(r.getAs[Long]("n_chars") / 64.0).toLong, 16L)
      assert(w === expected)
    }
  }

  test("a7_quantile_sketch: estimate brackets the exact value within one bin") {
    val rows = QueryRegistry.byName("a7_quantile_sketch").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(50, 90, 99).foreach { q =>
        val est = r.getAs[Double](s"est_p$q")
        val ex = r.getAs[Double](s"ex_p$q")
        assert(est > ex, s"p$q: upper-edge estimate must exceed the exact value")
        assert(est - ex <= 1.0, s"p$q: error exceeds one bin width ($est vs $ex)")
      }
    }
  }

  test("gr_triangles: participation sums to 3 per triangle, plan joins by hash") {
    val df = QueryRegistry.byName("gr_triangles").fn(spark, sf)
    val rows = df.collect()
    val total = rows.map(_.getAs[Long]("n_tri")).sum
    assert(total % 3 === 0, "each triangle must contribute exactly 3 participations")
    assert(rows.forall(_.getAs[Long]("n_tri") > 0))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "wedge close must be an equi-join, not a nested loop")
  }
}
