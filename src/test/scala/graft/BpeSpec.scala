package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Bpe, BpeEncodeExpr, BpeVocab, PairMerger}

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

  test("property: incremental PairMerger folding equals the full merge-loop re-encode") {
    // the correctness hinge of the train() optimization: folding each
    // training-shaped merge ONCE over the previous fixpoint must equal
    // re-encoding from scratch with the whole list. Merge lists are grown
    // the way training grows them — each new pair drawn from the word's
    // CURRENT incremental tokens — which is exactly the class where the
    // rank-order argument applies.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def applyReal(toks: Seq[String], a: String, b: String): Seq[String] = {
      val in = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val out = new PairMerger(a, b).merge(in)
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 300) {
      val w = Seq.fill(1 + rnd.nextInt(12))("abcd" (rnd.nextInt(4))).mkString
      val merges = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      var toks: Seq[String] = w.map(_.toString)
      for (_ <- 1 to 6 if toks.length >= 2) {
        val i = rnd.nextInt(toks.length - 1)
        val pair = (toks(i), toks(i + 1))
        if (merges.add(pair)) toks = applyReal(toks, pair._1, pair._2)
      }
      val full = new BpeVocab(merges.toSeq).encodeWord(w).toSeq
      assert(toks === full, s"word=$w merges=${merges.toSeq}")
    }
  }

  test("bpe_encode is SQL-callable through the extension registration") {
    val got = spark.sql("SELECT bpe_encode('winter batch') AS t")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("w", "in", "t", "er", "batch"))
  }
}
