package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityOps
import graft.streaming.Pipelines

/** The streaming DSIR admission gate: weights trained OFFLINE from the
  * sf0.001 corpus, applied FROZEN per micro-batch. The gate must admit
  * EXACTLY the documents the batch computation admits — same integer
  * scores, same per-token threshold rule — under any batching, and a
  * higher threshold can only shrink the admit set.
  */
class DsirStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stream admits exactly the batch admit set; thresholds are monotone") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-dsir").toString

    // offline: train + freeze the weight table from the corpus
    QualityOps.writeDsirWeights(spark, sfDir, s"$base/weights")
    val weights = spark.read.parquet(s"$base/weights")
    assert(weights.count() <= 512L, "weight table exceeds its designed bound")

    // batch truth: per-doc integer scores against the frozen table
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val scored = QualityOps.dsirScore(
      QualityOps.dsirFeatures(docs, Seq()), weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // threshold at the per-token score median so the gate genuinely splits
    val norms = scored.map { case (_, s, n) => s.toDouble / n }.sorted
    val thr = math.floor(norms(norms.length / 2)).toLong
    val batchAdmits = scored.filter { case (_, s, n) => s >= thr * n }
      .map(_._1).toSet
    assert(batchAdmits.nonEmpty && batchAdmits.size < scored.length,
      s"threshold $thr does not split the corpus (${batchAdmits.size}/${scored.length})")

    val rows = docs.as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val admittedDir = s"$base/admitted"
    val q = Pipelines.dsirGate(
        in.toDF().toDF("doc_id", "text"), s"$base/weights", s"$base/ckpt",
        thr, b => b.write.mode("append").parquet(admittedDir))
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { g =>
        in.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(admittedDir)
    val streamAdmits = streamed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamAdmits === batchAdmits,
      "stream admit set diverges from the batch computation")
    // the admitted rows carry the exact batch scores
    val streamScores = streamed.select("doc_id", "score", "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamScores === scored.filter(t => batchAdmits(t._1)).toSet)

    // monotonicity: doubling the threshold can only shrink the admit set
    val in2 = MemoryStream[(Long, String)]
    val admitted2 = s"$base/admitted2"
    val q2 = Pipelines.dsirGate(
        in2.toDF().toDF("doc_id", "text"), s"$base/weights", s"$base/ckpt2",
        thr * 2, b => b.write.mode("append").parquet(admitted2))
      .start()
    try { in2.addData(rows.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    val strict = spark.read.parquet(admitted2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict.subsetOf(streamAdmits), "higher threshold admitted a new doc")
  }
}
