package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants of the round-12 training-data operators beyond the DuckDB
  * oracle: batch-hard triplet structure (hardest positive is the exact
  * brute-force minimum; negatives are cross-label and bounded by the
  * brute-force maximum) and ensemble-dedup signal/cluster consistency
  * against the single-signal queries it fuses.
  */
class TripletEnsembleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = QueryRegistry.byName(name).fn(spark, sf)

  /** raw embeddings quantized exactly like the engine (floor(f·1e7)). */
  private lazy val emb: Map[Long, (Long, Array[Long])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(label as bigint) as label",
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000000.0D) as bigint)) as q")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).toArray))
      .toMap

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
      math.sqrt(b.map(x => x * x).sum.toDouble))
  }

  test("ss_triplet_mine: hardest positive is the brute-force same-label minimum; " +
    "negatives are cross-label, bounded, and the active flag is consistent") {
    val rows = run("ss_triplet_mine")
      .select("anchor", "pos_id", "pos_cos", "neg_id", "neg_cos", "active")
      .collect()
    assert(rows.length === emb.size, "one triplet row per anchor")
    rows.foreach { r =>
      val a = r.getLong(0)
      val (la, qa) = emb(a)
      // positive: exact brute-force hardest (minimum cosine, min-id ties)
      val posAll = emb.toSeq.filter { case (id, (l, _)) => id != a && l == la }
        .map { case (id, (_, q)) => (cos(qa, q), id) }
      val (expCos, expId) = posAll.minBy(identity)
      assert(r.getLong(1) === expId, s"anchor $a pos_id")
      assert(r.getDouble(2) === expCos, s"anchor $a pos_cos")
      if (!r.isNullAt(3)) {
        // negative: cross-label, candidate-bounded — never above the
        // brute-force cross-label maximum, and exactly the pair's cosine
        val n = r.getLong(3)
        val (ln, qn) = emb(n)
        assert(ln !== la, s"anchor $a mined a same-label negative $n")
        assert(r.getDouble(4) === cos(qa, qn), s"anchor $a neg_cos not the pair cosine")
        val negMax = emb.toSeq.filter { case (id, (l, _)) => id != a && l != la }
          .map { case (_, (_, q)) => cos(qa, q) }.max
        assert(r.getDouble(4) <= negMax, s"anchor $a neg_cos above brute-force max")
        assert(r.getBoolean(5) === (r.getDouble(4) > r.getDouble(2) - 0.1),
          s"anchor $a active flag")
      } else {
        assert(!r.getBoolean(5), s"anchor $a active without a negative")
      }
    }
  }

  test("dd_ensemble: per-signal flags match the single-signal queries, " +
    "cluster ids are component minima, union-dominance holds") {
    val ens = run("dd_ensemble")
      .select("doc_id", "cluster_id", "is_dropped", "text_dup", "embed_dup")
      .collect()
    val byDoc = ens.map(r => r.getLong(0) ->
      (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    // text signal == the winnow pair graph's node set (dd_cluster's rows)
    val textDocs = run("dd_cluster").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(byDoc.filter(_._2._3).keySet === textDocs,
      "text_dup flags must equal dd_cluster's node set")
    // embed signal == dd_semantic's pair participants (dropped ∪ kept_match)
    val sem = run("dd_semantic")
      .select("vec_id", "is_dropped", "kept_match").collect()
    val embedDocs = (sem.filter(_.getBoolean(1)).map(_.getLong(0)) ++
      sem.filter(!_.isNullAt(2)).map(_.getLong(2))).toSet
    assert(byDoc.filter(_._2._4).keySet === embedDocs,
      "embed_dup flags must equal dd_semantic's pair participants")
    ens.foreach { r =>
      val (d, c, dropped) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(c <= d, s"doc $d cluster id above its own id")
      assert(dropped === (c != d), s"doc $d is_dropped inconsistent")
      if (!r.getBoolean(3) && !r.getBoolean(4))
        assert(c === d, s"doc $d clustered without either signal firing")
    }
    // union dominance: fusing can only merge clusters, never split — every
    // text-signal component (dd_cluster) maps INTO one ensemble cluster
    val tc = run("dd_cluster").select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    tc.groupBy(_._2).foreach { case (tcl, members) =>
      val ecls = members.map(m => byDoc(m._1)._1).distinct
      assert(ecls.size === 1,
        s"text component $tcl split across ensemble clusters $ecls")
    }
  }
}
