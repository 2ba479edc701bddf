package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Bpe, BpeEncodeExpr, BpeVocab}

/** BPE merge-loop semantics: pinned vectors on the corpus vocabulary, the
  * reconstruction and vocabulary-membership invariants, and the SQL
  * registration. The cross-engine equivalence with the chained-replace
  * formulation is what the `tx_bpe_encode` oracle row checks.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pinned vectors: full-word merges, partial merges, unknown chars") {
    assert(Bpe.Corpus.encodeWord("customer").toSeq === Seq("customer"))
    assert(Bpe.Corpus.encodeWord("column").toSeq === Seq("column"))
    // w+in+t+er: (i,n) rank 1 and (e,r) rank 0 merge; (w,in) unranked
    assert(Bpe.Corpus.encodeWord("winter").toSeq === Seq("w", "in", "t", "er"))
    // characters outside every merge stay single
    assert(Bpe.Corpus.encodeWord("zzz").toSeq === Seq("z", "z", "z"))
    assert(Bpe.Corpus.encodeWord("x").toSeq === Seq("x"))
  }

  test("lowest rank wins when pairs overlap") {
    // "ter": (e,r) rank 0 beats any later pair; then (t,er) is unranked
    assert(Bpe.Corpus.encodeWord("ter").toSeq === Seq("t", "er"))
    // "join": j+o (rank 10) then jo+in needs (i,n) first? No — exhaust
    // lowest rank: (i,n) rank 1 < (j,o) rank 10, then (j,o), then (jo,in)
    assert(Bpe.Corpus.encodeWord("join").toSeq === Seq("join"))
  }

  test("leftmost non-overlapping merge on repeats") {
    val v = new BpeVocab(Seq(("a", "a")))
    assert(v.encodeWord("aaa").toSeq === Seq("aa", "a"))
    assert(v.encodeWord("aaaa").toSeq === Seq("aa", "aa"))
  }

  test("invariants over the corpus: tokens reconstruct the text, all multi-char tokens are vocabulary entries") {
    val vocabTokens = Bpe.CorpusMerges.map { case (a, b) => a + b }.toSet
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"),
        toCol(BpeEncodeExpr(toExpr(col("text")))).as("toks"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks.mkString("") === text.replace(" ", ""), "tokens must reconstruct the text")
      toks.filter(_.length > 1).foreach(t =>
        assert(vocabTokens.contains(t), s"non-vocabulary multi-char token $t"))
    }
  }

  test("the distributed training loop DERIVES the pinned corpus merges") {
    val derived = Bpe.train(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"), 32)
    assert(derived === Bpe.CorpusMerges,
      "Bpe.train must reproduce CorpusMerges from the sf0.01 corpus")
  }

  test("bpe_encode is SQL-callable through the extension registration") {
    val got = spark.sql("SELECT bpe_encode('winter batch') AS t")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("w", "in", "t", "er", "batch"))
  }
}
