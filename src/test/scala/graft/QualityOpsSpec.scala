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

  test("tx_quality_cutoff: the threshold IS the 3n/4-th smallest quality and keep matches it") {
    val rows = run("tx_quality_cutoff")
      .select("doc_id", "qmicro", "thr", "keep").collect()
    val qs = rows.map(_.getLong(1)).sorted
    val k = math.max(qs.length.toLong * 3 / 4, 1L).toInt
    val expected = qs(k - 1) // k-th smallest, 1-indexed
    rows.foreach { r =>
      assert(r.getLong(2) === expected, "threshold is not the exact order statistic")
      assert(r.getBoolean(3) === (r.getLong(1) >= expected))
    }
    // a quartile cut keeps at least a quarter and never everything (the
    // distribution at sf0.01 is non-degenerate)
    val kept = rows.count(_.getBoolean(3))
    assert(kept >= rows.length / 4 && kept < rows.length)
  }

  test("tx_budget_select: cum is the quality-descending running total and admits fill the budget") {
    val rows = run("tx_budget_select")
      .select("doc_id", "qmicro", "n_tok", "cum", "admitted").collect()
    val total = rows.map(_.getLong(2)).sum
    val budget = total / 2
    // replay the running total in (quality desc, doc_id asc) order
    var cum = 0L
    rows.sortBy(r => (-r.getLong(1), r.getLong(0))).foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) === cum, s"doc ${r.getLong(0)} cum mismatch")
      assert(r.getBoolean(4) === (cum <= budget))
    }
    val admitted = rows.filter(_.getBoolean(4))
    assert(admitted.nonEmpty && admitted.length < rows.length)
    // the admitted set spends the budget tightly: adding the best rejected
    // document's tokens would overflow it
    val spent = admitted.map(_.getLong(2)).sum
    val bestRejectedTok = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
      .find(!_.getBoolean(4)).map(_.getLong(2)).getOrElse(0L)
    assert(spent <= budget && spent + bestRejectedTok > budget)
  }

  test("tx_epoch_repeat: greedy epoch grants are monotone in quality order and spend the extra budget maximally") {
    val rows = run("tx_epoch_repeat")
      .select("doc_id", "qmicro", "n_tok", "epochs", "rep_tokens").collect()
    val total = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 4L,
        s"doc ${r.getLong(0)} epochs out of [1,4]")
      assert(r.getLong(4) === r.getLong(3) * r.getLong(2),
        s"doc ${r.getLong(0)} rep_tokens")
    }
    // grants never increase along (quality desc, doc_id) — the greedy order
    val ordered = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
    ordered.map(_.getLong(3)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "epoch grant increased down the quality order")
      case _ => ()
    }
    // the extra budget (one corpus-worth) is spent maximally: within the
    // marginal document's n_tok of the full pool, and never over it
    val extraSpent = rows.map(r => (r.getLong(3) - 1L) * r.getLong(2)).sum
    val marginalTok = ordered.find(_.getLong(3) < 4L).map(_.getLong(2)).getOrElse(0L)
    assert(extraSpent <= total, "extra grants overflow the budget")
    assert(extraSpent + marginalTok > total,
      "one more epoch of the marginal doc should not have fit")
  }

  test("tx_classifier_train: weights are non-trivial and one row per feature bucket") {
    val rows = run("tx_classifier_train").collect()
    val buckets = rows.map(_.getLong(0))
    assert(buckets.distinct.length === buckets.length, "duplicate bucket rows")
    assert(buckets.contains(-1L), "bias bucket missing")
    assert(buckets.contains(-2L) && buckets.contains(-3L), "engineered buckets missing")
    // the pocket pick is a trained epoch, not the zero init
    assert(rows.exists(_.getLong(1) !== 0L), "all-zero weight vector")
  }

  test("tx_classifier_score: every doc scored, pred = sign(margin), accuracy beats 0.7") {
    val df = run("tx_classifier_score").cache()
    val nDocs = core.Tables.documents(spark, sf).count()
    val rows = df.collect()
    assert(rows.length.toLong === nDocs, "a document failed to score")
    rows.foreach { r =>
      val (margin, pred, label, correct) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(pred === (if (margin > 0) 1L else -1L))
      assert(correct === (pred === label))
    }
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(acc > 0.7, f"train-set accuracy $acc%.3f below floor")
    df.unpersist()
  }

  test("tx_shard_pack: offsets replay the hash-order running token total") {
    val rows = run("tx_shard_pack")
      .select("doc_id", "h", "n_tok", "shard", "shard_off").collect()
    var cum = 0L
    rows.sortBy(r => (r.getLong(1), r.getLong(0))).foreach { r =>
      assert(r.getLong(3) === cum / 4096, s"doc ${r.getLong(0)} shard")
      assert(r.getLong(4) === cum % 4096, s"doc ${r.getLong(0)} shard_off")
      cum += r.getLong(2)
    }
    // the permutation is a genuine shuffle: hash order differs from id order
    val byH = rows.sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byH !== byH.sorted, "hash order degenerated to id order")
  }

  test("dd_intradoc: chunk accounting holds and clean text is dedup-idempotent") {
    val rows = run("dd_intradoc")
      .select("doc_id", "n_chunks", "n_kept", "clean_text").collect()
    assert(rows.nonEmpty)
    var dropped = 0L
    rows.foreach { r =>
      val (nChunks, nKept, clean) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(nKept <= nChunks)
      val toks = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(toks === 3 * nKept, s"doc ${r.getLong(0)} clean token count")
      // survivors are distinct chunks: re-chunking the clean text drops nothing
      val chunks = (if (clean.isEmpty) Array.empty[String] else clean.split(" "))
        .grouped(3).map(_.mkString(" ")).toSeq
      assert(chunks.distinct.length === chunks.length,
        s"doc ${r.getLong(0)} clean text still has a repeated chunk")
      dropped += nChunks - nKept
    }
    assert(dropped > 0, "corpus has no repeated passage at all — generator drifted?")
  }

  test("tx_domain_mix: rates are in (0,1], uniform target, kept mass never exceeds the target") {
    val rows = run("tx_domain_mix")
      .select("source", "n_docs", "tok", "target", "rate", "keep_tokens").collect()
    val totalTok = rows.map(_.getLong(2)).sum
    val target = totalTok / rows.length
    rows.foreach { r =>
      assert(r.getLong(3) === target, "target is not T div K")
      val rate = r.getDouble(4)
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getLong(5) <= math.min(r.getLong(2), target),
        s"${r.getString(0)} keeps more than its cap")
      // an under-target source is kept whole
      if (r.getLong(2) <= target) assert(rate === 1.0 && r.getLong(5) === r.getLong(2))
    }
  }

  test("tx_train_val_split: no near-dup pair straddles train and val, ~10% val") {
    // the operator's entire reason to exist: every winnow near-dup pair
    // must land on ONE side (a split that lets twins straddle leaks
    // training data into the eval set)
    val split = run("tx_train_val_split")
      .select("doc_id", "cluster_id", "side").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pairs = run("dd_winnow").select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty, "corpus has no near-dup pair at all — generator drifted?")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(split(a)._2 === split(b)._2,
        s"near-dup pair ($a, $b) straddles train/val")
      assert(split(a)._1 === split(b)._1, s"pair ($a, $b) in different clusters")
    }
    // the hash split is ~10% val on cluster ids (loose band — small corpus)
    val valFrac = split.values.count(_._2 == "val").toDouble / split.size
    assert(valFrac > 0.02 && valFrac < 0.25, s"val fraction $valFrac far from 10%")
    // deterministic: a rerun reproduces the exact assignment
    val again = run("tx_train_val_split")
      .select("doc_id", "side").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.forall { case (id, (_, side)) => again(id) == side })
  }

  test("tx_lm_score: formulaic text outscores gibberish through the corpus model") {
    val rows = run("tx_lm_score").select("doc_id", "n_bigrams", "lm_ppm").collect()
    assert(rows.forall(r => r.isNullAt(2) || r.getLong(2) >= 0))
    // every >=2-token doc scores; the score band is nontrivial (not constant)
    val scores = rows.filter(!_.isNullAt(2)).map(_.getLong(2))
    assert(scores.nonEmpty && scores.distinct.length > 10,
      "lm scores collapsed to a near-constant — smoothing or counts broken")
  }

  test("tx_dsir: weight bounds hold and the target language separates from the rest") {
    val rows = run("tx_dsir").select("doc_id", "lang", "score", "n_tok").collect()
    assert(rows.length === 20)
    // tgt_c <= raw_c per feature, so every weight <= Scale and every doc
    // score <= n_tok * Scale; smoothing keeps scores strictly positive.
    rows.foreach { r =>
      val (score, nTok) = (r.getLong(2), r.getLong(3))
      assert(score > 0L && score <= nTok * 1000000L,
        s"doc ${r.getLong(0)} score $score outside (0, n_tok*Scale]")
    }
    // scores arrive in the query's declared order
    assert(rows.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // Corpus-wide, the mean normalized score (score/n_tok) of the TARGET
    // language must exceed the rest — the direction importance resampling
    // exists to produce. (Checked over all docs, not the top-K: the raw
    // DSIR score is length-accumulated, so the top-K is length-dominated
    // on this synthetic corpus and the per-language margin only shows up
    // normalized.)
    val spark2 = spark
    import spark2.implicits._
    val norm = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(concat(lit("dsir:"), col("token"))), 1, 15), 16, 10)
          .cast("long") % 512L).as("f"))
      .groupBy(col("doc_id"), col("lang"), col("f")).agg(count(lit(1)).as("c"))
    val llr = norm.groupBy(col("f"))
      .agg(sum(col("c")).as("raw_c"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("tgt_c"))
      .select(col("f"), expr("(1000000 * (tgt_c + 1)) div (raw_c + 1)").as("w"))
    val sep = norm.join(broadcast(llr), Seq("f"))
      .groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        (sum(col("c") * col("w")).cast("double") / sum(col("c"))).as("nscore"))
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(avg(col("nscore")).as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(sep(true) > sep(false),
      s"target-language mean normalized DSIR score ${sep(true)} does not exceed rest ${sep(false)}")
  }
}
