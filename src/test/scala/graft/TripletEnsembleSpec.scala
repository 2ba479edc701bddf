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

  /** the engine's deterministic batch deal: 60-bit md5 prefix mod the
    * ceil(N/256) batch count — replayed exactly. */
  private def batchOf(id: Long, nbat: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % nbat
  }

  test("ss_triplet_mine: batch-hard picks match the brute-force within-batch model exactly") {
    val rows = run("ss_triplet_mine")
      .select("anchor", "pos_id", "pos_cos", "neg_id", "neg_cos", "active")
      .collect()
    assert(rows.length === emb.size, "one triplet row per anchor")
    val nbat = (emb.size + 255L) / 256L
    val batches = emb.keys.map(id => id -> batchOf(id, nbat)).toMap
    var nPos = 0
    var nNeg = 0
    rows.foreach { r =>
      val a = r.getLong(0)
      val (la, qa) = emb(a)
      val mates = emb.toSeq.filter { case (id, _) =>
        id != a && batches(id) == batches(a) }
      // positive: exact within-batch hardest (minimum cosine, min-id ties)
      val posAll = mates.filter { case (_, (l, _)) => l == la }
        .map { case (id, (_, q)) => (cos(qa, q), id) }
      if (posAll.nonEmpty) {
        val (expCos, expId) = posAll.minBy(identity)
        assert(r.getLong(1) === expId, s"anchor $a pos_id")
        assert(r.getDouble(2) === expCos, s"anchor $a pos_cos")
        nPos += 1
      } else assert(r.isNullAt(1), s"anchor $a positive without same-label batchmates")
      // negative: exact within-batch hardest (maximum cosine, min-id ties)
      val negAll = mates.filter { case (_, (l, _)) => l != la }
        .map { case (id, (_, q)) => (-cos(qa, q), id) }
      if (negAll.nonEmpty) {
        val (negExpCos, negExpId) = negAll.minBy(identity)
        assert(r.getLong(3) === negExpId, s"anchor $a neg_id")
        assert(r.getDouble(4) === -negExpCos, s"anchor $a neg_cos")
        nNeg += 1
      } else assert(r.isNullAt(3), s"anchor $a negative without cross-label batchmates")
      val expActive = posAll.nonEmpty && negAll.nonEmpty &&
        r.getDouble(4) > r.getDouble(2) - 0.1
      assert(r.getBoolean(5) === expActive, s"anchor $a active flag")
    }
    assert(nPos > rows.length / 2, "most anchors should find a positive")
    assert(nNeg > rows.length / 2, "most anchors should find a negative")
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
