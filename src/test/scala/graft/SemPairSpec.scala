package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Incremental maintenance of the semantic pair graph (round 14): the
  * SemDeDup within-label pair set is split into a base artifact (both
  * endpoints in the prior snapshot) plus a probe-fed batch delta (pairs
  * touching a vec_id ≥ the snapshot cut). The split must be EXACT set
  * algebra — incremental ≡ full rebuild, no duplicates, no losses — the
  * same contract ClusterSpec pins for the CC labels.
  */
class SemPairSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental base+delta pair graph equals the full rebuild exactly " +
    "(set equality AND cardinality — no duplicate emission across legs)") {
    val full = VectorOps.fullRebuildSemanticPairs(spark, sf)
    val inc = VectorOps.incrementalSemanticPairs(spark, sf)
    val fullSet = pairSet(full)
    val incRows = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(incRows.toSet === fullSet,
      "incremental semantic pairs diverge from the full within-label join")
    // cardinality equality proves the three legs (base / old×new / new×new)
    // are DISJOINT — a pair emitted by two legs would double-count every
    // downstream shared-pair aggregate even though the set compare passes
    assert(incRows.size === fullSet.size,
      "a pair was emitted by more than one leg of the incremental split")
    assert(fullSet.nonEmpty, "fixture corpus produced no semantic pairs — " +
      "the equality above would be vacuous")
    // and the delta legs must actually carry pairs on the fixture (the
    // top-10% slice of sf0.001 overlaps labels with the base) — otherwise
    // the incremental path was never exercised
    val cut = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(org.apache.spark.sql.functions.expr("(max(vec_id)*9) div 10"))
      .collect()(0).getLong(0)
    assert(fullSet.exists(p => p._2 >= cut || p._1 >= cut),
      "no pair touches the batch slice — the probe legs were not exercised")
  }
}
