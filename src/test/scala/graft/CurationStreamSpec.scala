package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** The streaming CURATION composition end to end: a quality pre-filter
  * upstream of the near-dup admit gate — the ingest shape a training-data
  * pipeline actually runs (filter cheap-and-local first, dedup against
  * global state second). The property under test is the composition, not
  * the pieces: low-quality rows must be dropped BEFORE the gate so they
  * never consume index space or candidate volume, while the gate's own
  * admit/replay semantics are unchanged by the upstream transform
  * (foreachBatch sees the filtered frame; the gate neither knows nor
  * cares that a filter ran).
  */
class CurationStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // cheap row-local quality proxy (the tx_quality composite's shape):
  // enough tokens and enough distinct tokens — spam ("buy buy buy …")
  // fails the distinct-ratio leg, fragments fail the length leg
  private val qualityPred =
    "size(split(text, ' ')) >= 8 AND " +
      "size(array_distinct(split(text, ' '))) / size(split(text, ' ')) >= 0.5"

  test("quality filter upstream of the near-dup gate: spam never reaches the index") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-curation").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, String)]
    val q = Pipelines.nearDupGate(
      in.toDF().toDF("doc_id", "text").filter(expr(qualityPred)),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      // batch 1: one good document, one spam (distinct ratio 1/8), one
      // fragment (3 tokens) — only the good one may reach the gate
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "buy buy buy buy buy buy buy buy"),
        (3L, "too short fragment"))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 under a new id (gate must drop it),
      // the same spam again (filter must drop it BEFORE the gate), and a
      // genuinely new good document (admits)
      in.addData(
        (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (5L, "buy buy buy buy buy buy buy buy"),
        (6L, "completely unrelated text about distributed query engines and parquet"))
      q.processAllAvailable()
      // batch 3: at-least-once replay of batch 2 → nothing admits twice
      in.addData(
        (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (5L, "buy buy buy buy buy buy buy buy"),
        (6L, "completely unrelated text about distributed query engines and parquet"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 6L),
      "only the two good, non-duplicate documents admit (spam and fragment " +
        "filtered, near-copy deduped, replay self-deduped)")

    // the index holds ONLY admitted signatures — the spam was filtered
    // before signing, so it consumed no index space on any delivery
    val indexed = Pipelines.readNearDupIndex(spark, s"$base/index")
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 6L))
  }
}
