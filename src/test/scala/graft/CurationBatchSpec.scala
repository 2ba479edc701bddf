package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Round-12 curation additions: tx_soft_dedup (cluster reweighting),
  * tx_vocab_coverage (tokenizer sizing), ss_outlier_flag (embedding
  * outlier signal). Oracles pin engine equivalence; these pin the
  * arithmetic CONTRACTS downstream consumers rely on.
  */
class CurationBatchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tx_soft_dedup: each cluster contributes ~one document of mass " +
    "(floor rounding only), singletons keep exactly 10^6") {
    val rows = QueryRegistry.byName("tx_soft_dedup").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val n = members.length
      assert(members.forall(_.getLong(2) == n.toLong),
        s"cluster $cid: n_members column disagrees with actual membership")
      val mass = members.map(_.getLong(3)).sum
      assert(mass <= 1000000L && mass > 1000000L - n,
        s"cluster $cid: mass $mass outside the floor-rounding envelope")
      if (n == 1)
        assert(members.head.getLong(3) === 1000000L, s"singleton $cid reweighted")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === docs, "soft dedup must weight EVERY document")
  }

  test("incremental CC label artifacts equal a full rebuild on the " +
    "composed snapshot (cluster + ensemble)") {
    import graft.operators.TextOps
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the served artifacts are maintained incrementally (base CC over the
    // prior snapshot's pairs + mergeLabels of the admitted batch's pairs);
    // the full rebuild is the weekly-compaction role — they must agree
    // EXACTLY, which is what lets every downstream consumer's full-graph
    // DuckDB oracle stay green over the incremental artifact
    assert(asMap(TextOps.incrementalClusterLabels(spark, sf))
      === asMap(TextOps.fullRebuildClusterLabels(spark, sf)),
      "incremental cluster labels diverge from the full rebuild")
    assert(asMap(TextOps.incrementalEnsembleLabels(spark, sf))
      === asMap(TextOps.fullRebuildEnsembleLabels(spark, sf)),
      "incremental ensemble labels diverge from the full rebuild")
  }

  test("tx_vocab_coverage: per-language totals reconcile and coverage is " +
    "exactly 10^6 iff nothing is out of vocab") {
    val rows = QueryRegistry.byName("tx_vocab_coverage").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, cov, oov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      total += n
      assert(cov >= 0L && cov <= 1000000L)
      assert((cov == 1000000L) === (oov == 0L),
        s"lang ${r.getString(0)}: coverage $cov inconsistent with oov_types $oov")
    }
    val expected = spark.sql(
      s"SELECT sum(size(split(text, ' '))) FROM parquet.`$sf/documents.parquet`")
      .collect()(0).getLong(0)
    assert(total === expected, "per-language token masses must sum to the corpus total")
  }

  test("dd_threshold_curve: pair/doc counts are non-increasing in tau and " +
    "tau=2 reproduces dd_winnow's pair count") {
    val rows = QueryRegistry.byName("dd_threshold_curve").fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L, 5L, 6L))
    val pairs = rows.map(_.getLong(1)).toSeq
    val docs = rows.map(_.getLong(2)).toSeq
    assert(pairs === pairs.sorted.reverse, "pair counts must be non-increasing in tau")
    assert(docs === docs.sorted.reverse, "doc counts must be non-increasing in tau")
    val winnow = QueryRegistry.byName("dd_winnow").fn(spark, sf).count()
    assert(rows.head.getLong(1) === winnow,
      "tau=2 row must equal the shipped dd_winnow pair count")
  }

  test("ss_centroid_drift: IID halves of one corpus drift far less than " +
    "the within-label scatter, and the rule is self-consistent") {
    val rows = QueryRegistry.byName("ss_centroid_drift").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) >= 0L, "squared drift negative")
      // the 90/10 split of ONE distribution: centroid shift stays well
      // under the typical member distance (ratio 10^6); sampling noise on
      // a ~5-member new half allows some slack but not parity
      assert(r.getLong(4) < 1000000L,
        s"label ${r.getLong(0)}: drift ratio ${r.getLong(4)} at member-distance scale on IID halves")
    }
  }

  test("dd_corpus_overlap: KMV estimates reconcile with the exact counts " +
    "riding in the same row") {
    val r = QueryRegistry.byName("dd_corpus_overlap").fn(spark, sf).collect().head
    val (nA, nB, nInter) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (mU, matches) = (r.getLong(3), r.getLong(4))
    val (jacc, estU, estI) = (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(mU <= 64L && matches <= mU)
    assert(jacc === matches * 1000000L / mU)
    val trueUnion = nA + nB - nInter
    if (mU < 64L) {
      // sub-k regime: the sketch IS the set — estimates must be exact
      assert(estU === trueUnion, "sub-k union estimate must be exact")
      assert(estI === nInter, "sub-k intersection estimate must be exact")
    } else {
      // sketch regime: KMV with k=64 has ~1/sqrt(62) ≈ 13% relative error;
      // accept 3 sigma
      assert(math.abs(estU - trueUnion).toDouble / trueUnion < 0.4,
        s"union estimate $estU vs true $trueUnion outside 3-sigma envelope")
    }
  }

  test("mm_phash_rank: the nearest perceptual neighbor of a clustered image " +
    "is a member of its own 4-doc cluster") {
    val rows = QueryRegistry.byName("mm_phash_rank").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val top1 = rows.filter(_.getLong(3) == 1L)
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getLong(0) / 4 === r.getLong(1) / 4,
        s"img ${r.getLong(0)}: rank-1 neighbor ${r.getLong(1)} crosses clusters")
    }
    // ranks are dense from 1 and hamming is non-decreasing within an image
    rows.groupBy(_.getLong(0)).foreach { case (img, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to sorted.length).toSeq)
      val hams = sorted.map(_.getLong(2)).toSeq
      assert(hams === hams.sorted, s"img $img: hamming not monotone over ranks")
    }
  }

  test("ss_outlier_flag: the flag is exactly the 2.5x-of-label-mean rule " +
    "over the returned distances, and flags a minority") {
    val rows = QueryRegistry.byName("ss_outlier_flag").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 0L, "squared distance negative"))
    rows.groupBy(_.getLong(1)).foreach { case (label, members) =>
      val mean = members.map(_.getLong(2)).sum / members.length
      members.foreach { r =>
        assert(r.getBoolean(4) === (r.getLong(2) * 2 > mean * 5),
          s"label $label vec ${r.getLong(0)}: flag disagrees with the rule")
      }
    }
    val flagged = rows.count(_.getBoolean(4))
    assert(flagged.toDouble / rows.length < 0.3,
      s"outlier rule flags $flagged/${rows.length} — not a tail signal")
  }
}
