package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.streaming.{Generations, Pipelines}

/** Streaming incremental union-find maintenance (round 13): the
  * labelMaintain sink folds each micro-batch of near-dup pairs into the
  * persisted `(doc_id, label)` artifact via mergeLabels + the Generations
  * protocol — final state must equal a one-shot CC over the concatenated
  * pair log, replays must be no-ops, and batches that bridge previously
  * distinct components must relabel them.
  */
class IncrementalCcStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def stateMap(dir: String): Map[Long, Long] =
    Generations.current(spark, dir)
      .map(_.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty)

  test("streamed batches converge to the one-shot CC over all pairs, " +
    "including a bridge batch that merges prior components") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("icc").toString
    val in = MemoryStream[(Long, Long)]
    val q = Pipelines.labelMaintain(
      in.toDF().toDF("doc_a", "doc_b"), s"$dir/state", s"$dir/ckpt").start()
    try {
      // batch 0: two disjoint chains
      in.addData((1L, 2L), (2L, 3L), (10L, 11L))
      q.processAllAvailable()
      assert(stateMap(s"$dir/state") ===
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // batch 1: new docs extend one component, a fresh pair starts another
      in.addData((3L, 4L), (20L, 21L))
      q.processAllAvailable()
      assert(stateMap(s"$dir/state") === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
      // batch 2: BRIDGES the 10- and 20-components — both must relabel to
      // the merged min (10), exercising the relabel leg across generations
      in.addData((11L, 21L))
      q.processAllAvailable()
      val fin = stateMap(s"$dir/state")
      val oneShot = TextOps.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L), (20L, 21L), (11L, 21L))
          .toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fin === oneShot, "streamed labels diverge from one-shot CC")
      assert(fin(21L) === 10L && fin(20L) === 10L, "bridge batch must relabel")
    } finally q.stop()
  }

  test("replaying a batch id re-merges from the prior generation (no-op)") {
    val dir = Files.createTempDirectory("icc-replay").toString + "/state"
    Pipelines.labelMaintainBatch(Seq((1L, 2L)).toDF("doc_a", "doc_b"), dir, 0L)
    Pipelines.labelMaintainBatch(Seq((2L, 5L)).toDF("doc_a", "doc_b"), dir, 1L)
    val once = stateMap(dir)
    // redelivery of batch 1: must read the generation strictly before it
    // and rewrite identical content — never double-merge its own output
    Pipelines.labelMaintainBatch(Seq((2L, 5L)).toDF("doc_a", "doc_b"), dir, 1L)
    assert(stateMap(dir) === once, "replay must be idempotent")
    assert(once === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("null and self pairs are dropped before the merge") {
    val dir = Files.createTempDirectory("icc-null").toString + "/state"
    val batch = Seq(
      (Option(1L), Option(2L)),
      (Option(3L), Option(3L)), // self pair: no component
      (Option(4L), Option.empty[Long]), // null endpoint: dropped
      (Option.empty[Long], Option(5L)))
      .toDF("doc_a", "doc_b")
    Pipelines.labelMaintainBatch(batch, dir, 0L)
    assert(stateMap(dir) === Map(1L -> 1L, 2L -> 1L))
  }
}
