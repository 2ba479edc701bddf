package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate
import graft.streaming.Pipelines

/** The streaming decontamination gate: benchmark-overlapping documents
  * drop at ingest, clean documents pass, and the verdict is EXACT — a
  * document overlapping the benchmark in any 4-word shingle never
  * survives, one merely sharing vocabulary (no full shingle) always does.
  * Statelessness: a replayed batch admits the identical set (the gate has
  * no cross-batch state to corrupt).
  */
class DecontaminateStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("gate drops shingle-overlap, passes vocabulary-overlap, exact across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-decon").toString

    // benchmark: two eval prompts
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "to be or not to be that is the question")
    ).toDF("doc_id", "text")
    Decontaminate.buildIndex(bench, s"$base/bench")

    val in = MemoryStream[(Long, String)]
    val admittedDir = s"$base/admitted"
    val q = Pipelines.decontaminateGate(
        in.toDF().toDF("doc_id", "text"), s"$base/bench", s"$base/ckpt",
        b => b.write.mode("append").parquet(admittedDir))
      .start()
    try {
      in.addData(
        // 101: contains "quick brown fox jumps" — a full benchmark shingle → drop
        (101L, "reports say a quick brown fox jumps over fences daily"),
        // 102: shares words (fox, dog) but no 4-word shingle → pass
        (102L, "a dog chased the fox across the brown field"),
        // 103: no overlap at all → pass
        (103L, "entirely unrelated text about spark query planning"))
      q.processAllAvailable()
      in.addData(
        // 104: quotes the second prompt verbatim mid-sentence → drop
        (104L, "he asked whether to be or not to be that is the question indeed"),
        // 105: clean → pass
        (105L, "another clean document with original content here"))
      q.processAllAvailable()

      val admitted = spark.read.parquet(admittedDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted === Set(102L, 103L, 105L))
    } finally q.stop()
  }
}
