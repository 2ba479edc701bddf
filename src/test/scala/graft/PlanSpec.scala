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

  test("X1 typed ABI decode participates in whole-stage codegen") {
    val p = plan("x1b_decode_abi")
    assert(p.contains("decode_log"), "decode_log expression missing from plan")
    val codegenLine = p.linesIterator
      .find(l => l.contains("decode_log") && l.contains("Project"))
    assert(codegenLine.exists(_.contains("*(")),
      s"decode Project not inside a codegen span: $codegenLine")
  }
}
