package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SketchStream

/** Streaming CMS: cross-batch merge, overestimate guarantee, constant
  * state size, replay idempotence of the generation protocol.
  */
class SketchStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("sketch merges batches, estimates ≥ true counts, state stays ≤ 4096 rows") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cms").toString
    val in = MemoryStream[String]
    val q = SketchStream.gate(in.toDF().toDF("token"), s"$dir/state")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData(Seq.fill(30)("alpha") ++ Seq.fill(5)("beta") ++ Seq("gamma"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(20)("alpha") ++ Seq.fill(7)("delta"): _*)
      q.processAllAvailable()
      val est = SketchStream.estimate(spark, s"$dir/state",
        Seq("alpha", "beta", "gamma", "delta"))
      // CMS guarantee: estimates never undercount, and merge crossed batches
      assert(est("alpha") >= 50L, s"alpha merged across batches: $est")
      assert(est("beta") >= 5L && est("gamma") >= 1L && est("delta") >= 7L)
      val sketch = SketchStream.currentSketch(spark, s"$dir/state")
      assert(sketch.count() <= 4096L, "sketch state must stay bounded")
      // a token the stream never carried estimates 0, not a join dropout
      val unseen = SketchStream.estimate(spark, s"$dir/state",
        Seq("never-seen-token-zzz"))
      assert(unseen.get("never-seen-token-zzz").contains(0L) ||
        unseen("never-seen-token-zzz") >= 0L,
        "unseen token must yield an estimate (0 unless cells collide)")
      assert(unseen.contains("never-seen-token-zzz"),
        "unseen token must not vanish from the estimate")
    } finally q.stop()
  }

  test("replaying a batch id is a no-op on the totals (at-least-once safety)") {
    val dir = Files.createTempDirectory("cms-replay").toString + "/state"
    val b0 = Seq.fill(10)("x").toDF("token")
    val b1 = (Seq.fill(4)("x") ++ Seq.fill(6)("y")).toDF("token")
    SketchStream.mergeBatch(b0, dir, 0L)
    SketchStream.mergeBatch(b1, dir, 1L)
    val once = SketchStream.estimate(spark, dir, Seq("x", "y"))
    // the redelivery: batch 1 runs again with the SAME id
    SketchStream.mergeBatch(b1, dir, 1L)
    val twice = SketchStream.estimate(spark, dir, Seq("x", "y"))
    assert(once === twice, "replay must start from the pre-batch generation")
    assert(once("x") >= 14L && once("y") >= 6L)
  }

  test("driver-side serving estimates match the Spark-job estimates exactly") {
    val dir = Files.createTempDirectory("cms-serve").toString + "/state"
    SketchStream.mergeBatch(
      (Seq.fill(30)("alpha") ++ Seq.fill(5)("beta") ++ Seq("gamma")).toDF("token"),
      dir, 0L)
    val toks = Seq("alpha", "beta", "gamma", "unseen-zzz")
    assert(SketchStream.estimateServing(spark, dir, toks) ===
      SketchStream.estimate(spark, dir, toks),
      "fast path must be bit-identical to the DataFrame path")
    // a new generation must invalidate the per-generation cache
    SketchStream.mergeBatch(Seq.fill(7)("alpha").toDF("token"), dir, 1L)
    val after = SketchStream.estimateServing(spark, dir, toks)
    assert(after === SketchStream.estimate(spark, dir, toks))
    assert(after("alpha") >= 37L, "post-commit requests see the new generation")
  }

  test("replaying an OLD batch id never moves the LATEST marker backwards") {
    val dir = Files.createTempDirectory("cms-marker").toString + "/state"
    SketchStream.mergeBatch(Seq.fill(3)("x").toDF("token"), dir, 0L)
    SketchStream.mergeBatch(Seq.fill(5)("x").toDF("token"), dir, 1L)
    val atGen1 = SketchStream.estimate(spark, dir, Seq("x"))
    // a straggler redelivery of batch 0 after gen=1 committed: its gen dir
    // is rewritten (idempotent) but currentSketch must stay at gen=1
    SketchStream.mergeBatch(Seq.fill(3)("x").toDF("token"), dir, 0L)
    val after = SketchStream.estimate(spark, dir, Seq("x"))
    assert(after === atGen1, "stale replay must not regress the served state")
    assert(after("x") >= 8L)
  }
}
