package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityOps
import graft.streaming.{Generations, Pipelines}

/** DSIR retrain-and-swap (round 11): the operational half of the frozen
  * weight table. New weights are trained and STAGED beside the old
  * generation (`Generations.stage` — invisible to the live gate), the
  * admit-set drift on a holdout is measured (`dsirAdmitDrift`), then the
  * swap is an atomic `Generations.promote`. The gate resolves the marker
  * once per micro-batch, so admissions change EXACTLY at the first batch
  * boundary after the promote — never mid-batch, never before.
  */
class DsirSwapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("mid-stream weight swap changes admissions only at the swap boundary") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-dsir-swap").toString
    val root = s"$base/weights"
    val thr = 500000L // per-token micro-score threshold, between the two w tiers

    // corpus A: target-language mass on alpha/beta → their buckets carry
    // w ≈ 1e6, gamma/delta ≈ 6e4. Corpus B is the mirror.
    def corpus(enWords: String, otherWords: String) =
      ((1L to 4L).map(i => (i, enWords, "en")) ++
        (5L to 8L).map(i => (i, otherWords, "fr")))
        .toDF("doc_id", "text", "lang")
    QualityOps.stageDsirWeights(
      corpus("alpha beta alpha beta", "gamma delta gamma delta"), root, 1L)
    Generations.promote(root, 1L)

    val d1 = (101L, "alpha beta alpha beta")
    val d2 = (102L, "gamma delta gamma delta")
    val in = MemoryStream[(Long, String)]
    val admitted = ArrayBuffer.empty[Set[Long]]
    val q = Pipelines.dsirGateGen(
        in.toDF().toDF("doc_id", "text"), root, s"$base/ckpt", thr,
        b => admitted += b.select("doc_id").collect().map(_.getLong(0)).toSet)
      .start()
    try {
      // batch 1 under gen=1: the alpha/beta doc clears the bar, gamma/delta not
      in.addData(d1, d2); q.processAllAvailable()
      assert(admitted.last === Set(101L))

      // STAGE gen=2 (mirror corpus) — built beside the old, not yet live
      QualityOps.stageDsirWeights(
        corpus("gamma delta gamma delta", "alpha beta alpha beta"), root, 2L)
      // pre-promote drift check on the holdout: exactly the two flips
      val drift = QualityOps.dsirAdmitDrift(spark,
          Seq(d1, d2).toDF("doc_id", "text"), root, 1L, 2L, thr)
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2))))
        .toMap
      assert(drift === Map(101L -> ((true, false)), 102L -> ((false, true))))

      // batch 2, STILL under gen=1: staging must not change admissions
      in.addData(d1, d2); q.processAllAvailable()
      assert(admitted.last === Set(101L),
        "a staged-but-unpromoted generation leaked into the live gate")

      // PROMOTE, then batch 3: the flip happens at this boundary and only here
      Generations.promote(root, 2L)
      in.addData(d1, d2); q.processAllAvailable()
      assert(admitted.last === Set(102L))

      // straggler promote of the retired generation is a monotonic no-op
      Generations.promote(root, 1L)
      in.addData(d1, d2); q.processAllAvailable()
      assert(admitted.last === Set(102L))
    } finally q.stop()
  }
}
