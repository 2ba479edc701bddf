package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Physical-plan quality gates — the properties that make these plans
  * survive a 100 TB scale-up, asserted so a refactor can't silently lose
  * them: predicate pushdown and column pruning reach the parquet scan,
  * small dimensions broadcast instead of shuffling, top-k queries run as
  * TakeOrderedAndProject instead of a global sort, and custom expressions
  * stay inside whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String = {
    val df = QueryRegistry.byName(name).fn(spark, sf)
    df.collect() // finalize the AQE plan so codegen spans are visible
    df.queryExecution.executedPlan.toString
  }

  test("P9 range predicate is pushed down to the parquet scan") {
    val p = plan("p9_range_pred")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    assert(p.contains("l_shipdate"), "shipdate filter not at the scan")
    assert(!p.replaceAll("(?s)PushedFilters: \\[[^\\]]*", "").contains("PushedFilters: []"),
      "pushed filter list is empty")
  }

  test("P10 projection prunes the scan to the selected columns") {
    val p = plan("p10_projection")
    val schemaLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("o_orderkey") && schemaLine.contains("o_orderpriority"))
    assert(!schemaLine.contains("o_comment"), "unprojected column read from parquet")
  }

  test("P15 string prefix pushes down as StringStartsWith") {
    val p = plan("p15_prefix_scan")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    assert(p.contains("StringStartsWith"), "prefix filter not pushed to parquet")
  }

  test("J1 semi-join and J2b snowflake dims broadcast (no shuffle of the fact side)") {
    assert(plan("j1_semi_join").contains("BroadcastHashJoin"))
    val multi = plan("j2b_multiway_join")
    assert("BroadcastHashJoin".r.findAllIn(multi).size >= 2,
      "nation/region dims should both broadcast")
  }

  test("P2 dispatch registry broadcasts") {
    assert(plan("p2_log_dispatch").contains("BroadcastHashJoin"))
  }

  test("top-1 queries run as TakeOrderedAndProject, not a global sort") {
    assert(plan("a3_maxby").contains("TakeOrderedAndProject"))
    assert(plan("api_tx_last").contains("TakeOrderedAndProject"))
  }

  test("q1_agg aggregates with map-side partial aggregation inside codegen") {
    val p = plan("q1_agg")
    // "*(n)" is the WholeStageCodegen span marker in the executed plan
    assert(p.contains("*("), "no whole-stage codegen span")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("no accidental cartesian/nested-loop joins in the heavy extension queries") {
    Seq("ss_topk_ivf", "j10_range_bucketed", "tx_curation", "dd_minhash_lsh").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n plans a nested-loop join")
    }
  }

  test("X1 hex decode participates in whole-stage codegen") {
    val p = plan("x1_decode_log")
    assert(p.contains("hex_to_long"), "custom expression missing from plan")
    val codegenLine = p.linesIterator
      .find(l => l.contains("hex_to_long") && l.contains("Project"))
    assert(codegenLine.exists(_.contains("*(")),
      s"decode Project not inside a codegen span: $codegenLine")
  }

  test("audio/video metadata codecs participate in whole-stage codegen") {
    Seq("mm_audio_meta" -> "audio_meta", "mm_video_meta" -> "video_meta")
      .foreach { case (q, fn) =>
        val p = plan(q)
        assert(p.contains(fn), s"$fn expression missing from $q plan")
        val codegenLine = p.linesIterator
          .find(l => l.contains(fn) && l.contains("Project"))
        assert(codegenLine.exists(_.contains("*(")),
          s"$fn Project not inside a codegen span: $codegenLine")
      }
  }

  test("tx_exchange_ops is a single-pass column program (no join, one scan)") {
    val p = plan("tx_exchange_ops")
    assert(!p.contains("Join"), "the CASE-dispatch pipeline must not join")
    // count scans in the FINAL plan only (AQE's toString repeats the tree
    // under "== Initial Plan ==")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).size === 1, "more than one scan")
  }

  test("global rank and scalar head avoid single-partition windows") {
    // a6: every Window is partitioned by the day bucket (two-pass rank)
    val p6 = plan("a6_running_count")
    val winLines = p6.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, "a6 lost its windowed local rank")
    assert(winLines.forall(_.contains("bkt")),
      s"unpartitioned window in a6: $winLines")
    // f12: the chain head is a broadcast scalar, not a window at all
    val pf = plan("f12_status_confirmations")
    assert(!pf.contains("Window ["), "f12 should broadcast the head, not window")
    assert(pf.contains("BroadcastNestedLoopJoin") || pf.contains("BroadcastExchange"),
      "f12 head should ride a broadcast")
    // the console reports' running Count uses the same two-pass shape
    Seq("api_report_holders", "api_report_lasttx").foreach { n =>
      val p = plan(n)
      val wins = p.linesIterator.filter(_.contains("Window [")).toSeq
      assert(wins.nonEmpty && wins.forall(_.contains("bkt")),
        s"unpartitioned window in $n: $wins")
    }
  }

  test("X1 typed ABI decode participates in whole-stage codegen") {
    val p = plan("x1b_decode_abi")
    assert(p.contains("decode_log"), "decode_log expression missing from plan")
    val codegenLine = p.linesIterator
      .find(l => l.contains("decode_log") && l.contains("Project"))
    assert(codegenLine.exists(_.contains("*(")),
      s"decode Project not inside a codegen span: $codegenLine")
  }

  test("curation-signal operators keep their scale shapes") {
    // decontamination: the benchmark side broadcasts, never shuffles the corpus
    val pd = plan("dd_decontaminate")
    assert(pd.contains("BroadcastHashJoin"), "bench side must broadcast")
    // packing: every window is partitioned by the (lang, bucket) pair
    val pp = plan("tx_chunk_pack")
    val winLines = pp.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("bkt")),
      s"unpartitioned window in tx_chunk_pack: $winLines")
    // kmeans: K centroid arrays broadcast; the N-side never shuffles whole
    val pk = plan("ss_kmeans_assign")
    assert(pk.contains("BroadcastExchange"), "centroids must broadcast")
    // budget selection: the quality-ordered cumsum windows are partitioned
    // by the quality range bucket (and Prefix's superbucket) — never global
    val pb = plan("tx_budget_select")
    val bw = pb.linesIterator.filter(_.contains("Window [")).toSeq
    assert(bw.nonEmpty && bw.forall(_.contains("bkt")),
      s"unpartitioned window in tx_budget_select: $bw")
    // quality cutoff: only the histogram (≤1e6 distinct values) is ranked,
    // inside Prefix's superbucket-partitioned windows
    val pc = plan("tx_quality_cutoff")
    val cw = pc.linesIterator.filter(_.contains("Window [")).toSeq
    assert(cw.forall(_.contains("bkt")),
      s"unpartitioned window in tx_quality_cutoff: $cw")
  }

  test("round-7 curation operators keep their scale shapes") {
    // semantic dedup: pair space bounded by the cluster-key equi-join —
    // never a cartesian — and the keep-min winner is a partial aggregate,
    // not a window over the pair stream
    val ps = plan("dd_semantic")
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      "dd_semantic pair space must be the cluster equi-join")
    assert(!ps.contains("Window ["), "dd_semantic must partial-aggregate the winner")
    // mix application: the K-row rate table broadcasts; the corpus side is
    // one narrow map (no corpus-sized shuffle beyond the per-source agg)
    val pm = plan("tx_mix_apply")
    assert(pm.contains("BroadcastHashJoin"), "rate table must broadcast")
    // leakage-safe split: the corpus joins the CC label table on doc_id —
    // no window, no cartesian; label side is the checkpointed CC output
    val pv = plan("tx_train_val_split")
    assert(!pv.contains("Window [") && !pv.contains("CartesianProduct"),
      "tx_train_val_split must stay a label join + narrow map")
  }

  test("incremental LSH probe never shuffles the corpus for a join") {
    val p = plan("dd_incremental_lsh")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "probe/verify joins must broadcast the batch-derived side")
    assert(p.contains("BroadcastHashJoin"),
      "band probe should be a broadcast hash join")
    // corpus pays exactly its signature-build shuffle; the only other hash
    // exchanges are batch-derived (candidate distinct + per-doc verdict agg)
    val finalPlan = p.split("== Initial Plan ==").head
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(nShuffles <= 3, s"unexpected extra shuffle: $nShuffles hash exchanges")
  }

  test("large-batch LSH probe never broadcasts the batch side") {
    val df = QueryRegistry.byName("dd_incremental_lsh_big").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only broadcast allowed is the 1-row scalar cut (nested-loop);
    // every batch-derived table must cross the cluster as a shuffle
    assert(!p.contains("BroadcastHashJoin"),
      "batch-derived side broadcast in the large-batch path")
    assert(p.contains("ShuffledHashJoin"),
      "band probe should be a shuffled hash join")
  }

  test("incremental embed probe never shuffles the corpus for a join") {
    val p = plan("dd_incremental_embed")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "probe/verify joins must broadcast the batch-derived side")
    assert(p.contains("BroadcastHashJoin"),
      "code probe should be a broadcast hash join")
  }

  test("large-batch embed probe never broadcasts the batch side") {
    val df = QueryRegistry.byName("dd_incremental_embed_big").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only broadcast allowed is the 1-row scalar cut (nested-loop);
    // every batch-derived table must cross the cluster as a shuffle
    assert(!p.contains("BroadcastHashJoin"),
      "batch-derived side broadcast in the large-batch embed path")
    assert(p.contains("ShuffledHashJoin"),
      "code probe should be a shuffled hash join")
  }

  test("argmin/top-k partial-aggregates — no window over the ranked stream") {
    Seq("ss_topk_brute", "ss_topk_lsh", "ss_topk_lsh4", "ss_topk_ivf",
        "ss_topk_quant", "ss_kmeans_assign", "ss_maxsim", "ss_maxsim_ivf",
        "w1b_topk_per_key").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Window ["), s"$n still ranks the pair stream with a window")
      assert("(Object)?(Hash|Sort)Aggregate".r.findAllIn(p).size >= 2,
        s"$n does not partial-aggregate the pair stream")
    }
  }

  test("tx_budget_select's bucket assignment is structurally pinned") {
    // Two consumers (the per-bucket window and the bucket-totals cumsum)
    // read the range-partitioned frame; its spark_partition_id() bucket ids
    // are only consistent across them if BOTH see one materialized
    // RangePartitioner execution. The query localCheckpoints the ranged
    // frame, so the analyzed plan must scan a checkpointed RDD and contain
    // NO live range-repartition — a dropped pin reintroduces
    // REPARTITION_BY_RANGE into the lineage and two consumers could each
    // trigger a fresh, differently-sampled partitioning (corrupted cumsum).
    val df = QueryRegistry.byName("tx_budget_select").fn(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("LogicalRDD"),
      "ranged frame is not checkpoint-pinned (no LogicalRDD scan in the plan)")
    assert(!analyzed.contains("RepartitionByExpression"),
      "live range repartition in the lineage — bucket ids can re-sample per consumer")
  }

  test("tx_dsir tokenizes the corpus once — the (doc,f) exchange is reused") {
    // both consumers (feature totals, scoring join) must read ONE
    // (doc_id, lang, f) exchange; losing the reuse re-runs the per-token
    // md5 map — measured 20.6 s vs 12.9 s on the 64× replica
    val p = plan("tx_dsir")
    assert(p.contains("ReusedExchange"),
      "tx_dsir no longer reuses the (doc_id, lang, f) exchange — the corpus is tokenized twice")
  }

  test("tx_source_cap caps per-source lists in the partial aggregate, not a window") {
    val p = plan("tx_source_cap")
    assert(!p.contains("Window ["), "source cap still ranks with a window sort")
    assert("(Object)?(Hash|Sort)Aggregate".r.findAllIn(p).size >= 2,
      "source cap does not partial-aggregate before the shuffle")
  }

  test("j11 interval-overlap joins on buckets — no cartesian, no nested loop") {
    val p = plan("j11_interval_overlap")
    assert(!p.contains("CartesianProduct"), "interval overlap plans a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "interval overlap plans a nested loop")
  }

  test("bucketed co-located join: zero hash exchanges, bucketed scans, SMJ") {
    val p = plan("lo_bucketed_join")
    assert(p.contains("Bucketed: true"), "scan does not use the bucket layout")
    assert(p.contains("SortMergeJoin"), "join left the merge path")
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed layout must satisfy every clustering requirement — " +
        "aggregations and the join may not re-shuffle")
    assert(!p.contains("BroadcastHashJoin"),
      "merge hint lost — the demo must exercise the co-located SMJ path")
  }

  test("int_dot multiply-accumulate stays inside whole-stage codegen") {
    val p = plan("ss_topk_brute")
    assert(p.contains("int_dot"), "int_dot expression missing from plan")
    val codegenLine = p.linesIterator
      .find(l => l.contains("int_dot") && l.contains("Project"))
    assert(codegenLine.exists(_.contains("*(")),
      s"int_dot Project not inside a codegen span: $codegenLine")
  }
}
