package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry
import graft.operators.VectorOps

/** Focused invariants for the round-15 beam-walk re-cut: the walk now
  * carries each beam row's exact score instead of re-deriving it every
  * hop, and hops join the memoized payload-carrying adjacency index
  * instead of re-symmetrizing the graph. These tests pin the two claims
  * that re-cut rests on.
  */
class GraphWalkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graphAdjacency: symmetric, self-loop-free, payload rows match the " +
    "quantized corpus exactly") {
    val adj = VectorOps.graphAdjacency(spark, sf)
      .select(col("src"), col("dst"), col("qarr"), col("nc"))
    val n = adj.count()
    assert(n > 0)
    // symmetric: every (src, dst) has its (dst, src) mirror
    val asym = adj.select(col("src"), col("dst"))
      .join(adj.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
      .count()
    assert(asym === 0L, "adjacency must be symmetrized")
    assert(adj.filter(col("src") === col("dst")).count() === 0L)
    // the attached neighbor payload is byte-identical to the quantized
    // corpus row it denormalizes (a stale or re-derived payload would
    // silently skew every hop's scores)
    val emb = VectorOps.quantized(spark, sf, withBucket = false)
      .select(col("vec_id").as("dst"), col("qarr").as("e_qarr"),
        col("nrm").as("e_nc"))
    val mismatched = adj.join(emb, Seq("dst"))
      .filter(col("nc") =!= col("e_nc") ||
        expr("qarr != e_qarr"))
      .count()
    assert(mismatched === 0L, "adjacency payloads must equal the corpus rows")
  }

  test("ss_graph_search: carried scores are bit-identical to an " +
    "independent recompute of the shared integer-cosine formula") {
    val walk = QueryRegistry.byName("ss_graph_search").fn(spark, sf)
      .select(col("q_id"), col("n_id"), col("cos"))
    val emb = VectorOps.quantized(spark, sf, withBucket = false)
    val q = emb.select(col("vec_id").as("q_id"), col("qarr").as("qa"),
      col("nrm").as("na"))
    val c = emb.select(col("vec_id").as("n_id"), col("qarr").as("qb"),
      col("nrm").as("nb"))
    // independent recompute: exact Long dot via aggregate/zip_with (not
    // the IntDotExpr the walk uses) feeding the same 3-op IEEE tree —
    // any score the walk reused instead of re-deriving must still match
    val recomputed = walk.join(q, Seq("q_id")).join(c, Seq("n_id"))
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("dot",
        expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("cos2",
        col("dot").cast("double") / (sqrt(col("na")) * sqrt(col("nb"))))
    assert(recomputed.count() === walk.count(),
      "every walk row must have both payloads and nonzero norms")
    val drift = recomputed.filter(col("cos") =!= col("cos2")).count()
    assert(drift === 0L, "carried beam scores must be bit-exact")
  }

  test("ss_graph_search is deterministic across runs and rank-dense per query") {
    val a = QueryRegistry.byName("ss_graph_search").fn(spark, sf).collect().toSeq
    val b = QueryRegistry.byName("ss_graph_search").fn(spark, sf).collect().toSeq
    assert(a === b)
    a.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted
      assert(rnks === (1L to rnks.length).toSeq, "rnk must be dense from 1")
      val coss = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (x, y) => x >= y },
        "cos must be non-increasing in rank")
    }
  }
}
