package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** The streaming near-dup admit gate end to end: micro-batches probe the
  * growing parquet index, near-copies of earlier admits are dropped, and a
  * replayed batch admits nothing twice (the index is the effectively-once
  * guard). */
class NearDupStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("admit gate drops near-copies across batches and self-dedups replays") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-ndgate").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, String)]
    val q = Pipelines.nearDupGate(
      in.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      // batch 1: two distinct documents → both admitted
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "colorless green ideas sleep furiously under a bright winter moon"))
      q.processAllAvailable()
      // batch 2: a copy of doc 1's text under a new id (identical text
      // collides on every band — the deterministic near-dup limit case;
      // partial-overlap jaccard thresholds are pinned by the
      // dd_incremental_lsh oracle) + a genuinely new document
      in.addData(
        (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4L, "completely unrelated text about distributed query engines and parquet"))
      q.processAllAvailable()
      // batch 3: at-least-once replay of batch 2 → nothing admits twice
      in.addData(
        (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4L, "completely unrelated text about distributed query engines and parquet"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 2L, 4L),
      "near-copy 3 must drop; 1, 2, 4 must admit exactly once")

    // the index holds exactly the admitted signatures
    val indexed = spark.read.parquet(s"$base/index/sig")
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 2L, 4L))
  }
}
