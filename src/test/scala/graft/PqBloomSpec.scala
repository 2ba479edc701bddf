package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants of the round-8 operators beyond the DuckDB oracle:
  * PQ candidate/rerank structure, Bloom-prefilter exactness (the clean set
  * must be the exact complement of the exact-join contaminated set), and
  * sliding-window slot arithmetic.
  */
class PqBloomSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = QueryRegistry.byName(name).fn(spark, sf)

  test("ss_topk_pq: 5 exact-rescored neighbors per query, ranked by cosine") {
    val rows = run("ss_topk_pq")
      .select("q_id", "n_id", "cos", "rnk").collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size === 16)
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L), s"q=$q ranks")
      val byRnk = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a >= b }, s"q=$q not sorted")
      rs.foreach(r => assert(r.getLong(1) !== q, s"q=$q returned itself"))
    }
    // the reported cosine is EXACT (PQ only selects candidates; the rerank
    // rescores them at full precision): recompute each output pair's
    // cosine from the raw embeddings with the identical quantization
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000000.0D) as bigint)) as q")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    rows.foreach { r =>
      val (q, n, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (a, b) = (emb(q), emb(n))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expect = dot.toDouble /
        (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
      assert(cos === expect, s"pair ($q,$n) not exactly rescored")
    }
  }

  test("dd_decontaminate_bloom: clean set is the exact complement of the flagged set") {
    val clean = run("dd_decontaminate_bloom")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = run("dd_decontaminate")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 97 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((clean intersect flagged).isEmpty, "a flagged doc leaked into the clean set")
    assert((clean union flagged) === corpus, "clean ∪ flagged must cover the corpus")
    assert(flagged.nonEmpty, "fixture should contain contamination")
  }

  test("tx_cms_heavyhitters: the CMS overestimate guarantee holds row by row") {
    val rows = run("tx_cms_heavyhitters")
      .select("token", "true_count", "cms_est", "overcount").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: CMS must never underestimate")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("w7_sliding_window: every event lands in exactly width/slide = 2 windows") {
    val df = run("w7_sliding_window").select("wstart", "n").collect()
    val totalWindowed = df.map(_.getLong(1)).sum
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(totalWindowed === 2 * nEvents)
    df.foreach { r =>
      val epochS = r.getTimestamp(0).getTime / 1000
      assert(epochS % 300 === 0, s"window start ${r.getTimestamp(0)} not 5-min aligned")
    }
  }
}
