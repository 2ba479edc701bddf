package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** The streaming EMBEDDING dedup admit gate end to end — the vector mirror
  * of NearDupStreamSpec: micro-batches probe the growing quantized index,
  * near-copies (cosine >= 0.95) of earlier admits drop, replays admit
  * nothing twice (cosine self-match + the explicit id guard), the
  * intra-batch pass keeps exactly one of two near-dups arriving together,
  * and compaction holds the run count bounded without changing verdicts.
  */
class EmbedDupStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // 8-dim unit-ish vectors (signBucket reads the first 8 components)
  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
  private val e1 = v(1, 0, 0, 0, 0, 0, 0, 0)
  private val e2 = v(0, 1, 0, 0, 0, 0, 0, 0)
  private val e3 = v(0, 0, 1, 0, 0, 0, 0, 0)
  // near-copy of e1: cos ≈ 0.99995 >= 0.95
  private val e1near = v(0.999, 0.01, 0, 0, 0, 0, 0, 0)

  test("admit gate drops near-copies across batches and self-dedups replays") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edgate").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      // batch 1: two orthogonal vectors → both admit
      in.addData((1L, e1), (2L, e2))
      q.processAllAvailable()
      // batch 2: a near-copy of vector 1 under a new id drops; a genuinely
      // new direction admits
      in.addData((3L, e1near), (4L, e3))
      q.processAllAvailable()
      // batch 3: at-least-once replay of batch 2 → nothing admits twice
      in.addData((3L, e1near), (4L, e3))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 2L, 4L),
      "near-copy 3 must drop; 1, 2, 4 must admit exactly once")
    val indexed = Pipelines.readNearDupIndex(spark, s"$base/index")
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 2L, 4L))
  }

  test("shuffleProbe mode admits identically to the broadcast probe") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edshuf").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir),
      shuffleProbe = true).start()
    try {
      in.addData((1L, e1), (2L, e2))
      q.processAllAvailable()
      in.addData((3L, e1near), (4L, e3))
      q.processAllAvailable()
      // replay through the large-batch path self-dedups the same way
      in.addData((3L, e1near), (4L, e3))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 2L, 4L),
      "the shuffle probe must reproduce the broadcast probe's admits")
  }

  test("id guard: a retried vec_id with a perturbed payload does not double-admit") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edretry").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      in.addData((1L, e1))
      q.processAllAvailable()
      // upstream retry re-sends id 1 with a DIFFERENT (orthogonal) payload:
      // cosine alone would admit it — the id guard must not
      in.addData((1L, e2))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(admitted === Seq(1L), "retried id 1 must admit exactly once")
  }

  test("conflicting same-id payloads in ONE batch pick the max-struct winner, order-free") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edconflict").toString

    // same vec_id, two DIFFERENT embeddings in one delivery — the winner
    // must be the max payload struct regardless of arrival order (array<float>
    // orders lexicographically: e2 = [0,1,...] < e1 = [1,0,...], so e1 wins)
    def runOnce(tag: String, rows: (Long, Seq[Float])*): Seq[(Long, Seq[Float])] = {
      val in = MemoryStream[(Long, Seq[Float])]
      val q = Pipelines.embedDupGate(
        in.toDF().toDF("vec_id", "embedding"),
        s"$base/index-$tag", s"$base/ckpt-$tag",
        out => out.write.mode("append").parquet(s"$base/admitted-$tag")).start()
      try { in.addData(rows: _*); q.processAllAvailable() } finally q.stop()
      spark.read.parquet(s"$base/admitted-$tag")
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
        .collect().sortBy(_._1).toSeq
    }
    val fwd = runOnce("fwd", (1L, e2), (1L, e1))
    val rev = runOnce("rev", (1L, e1), (1L, e2))
    assert(fwd === Seq((1L, e1)), s"expected max-struct payload e1 to win, got $fwd")
    assert(rev === fwd, "intra-batch winner depends on arrival order")
  }

  test("a vec_id delivered twice in ONE micro-batch admits one row, not an amplified join") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-eddup").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      in.addData((1L, e1), (1L, e1), (2L, e2))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 2L), "duplicate delivery must collapse to one admit row")
    // and the sealed index holds exactly one row per id
    val indexed = Pipelines.readNearDupIndex(spark, s"$base/index")
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 2L))
  }

  test("intra-batch pass keeps exactly one of two near-dups arriving together") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edintra").toString
    val admittedDir = s"$base/admitted"

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir),
      intraBatch = true).start()
    try {
      in.addData((1L, e1), (2L, e1near), (3L, e2))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 3L),
      "first-wins: lower id 1 admits, near-dup 2 drops, orthogonal 3 admits")
  }

  test("zero vectors: the first admits, later ones drop (zero-vs-zero scores 1.0)") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-edzero").toString
    val admittedDir = s"$base/admitted"
    val zero = v(0, 0, 0, 0, 0, 0, 0, 0)

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Pipelines.embedDupGate(
      in.toDF().toDF("vec_id", "embedding"),
      s"$base/index", s"$base/ckpt",
      out => out.write.mode("append").parquet(admittedDir)).start()
    try {
      in.addData((1L, zero), (2L, e1))
      q.processAllAvailable()
      // a second zero vector: cosine is undefined (0/0 — the raw ANSI
      // division would kill the batch), so cosFrom's total convention
      // applies: zero-vs-zero scores 1.0 and the duplicate-in-spirit zero
      // drops instead of piling up in the index
      in.addData((3L, zero))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(admitted === Seq(1L, 2L),
      "first zero vector admits; the second collapses onto it")
  }

  test("run compaction bounds the index file count with verdicts unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val baseC = Files.createTempDirectory("graft-edcomp").toString
    val baseU = Files.createTempDirectory("graft-eduncomp").toString

    // 12 batches of one new orthogonal-ish vector each (distinct buckets
    // via alternating signs), every 3rd batch a near-copy of vector 1
    val batches = (0 until 12).map { i =>
      val id = 100L + i
      if (i % 3 == 2) (id, e1near)
      else (id, v((i % 8).toDouble / 8.0 + 0.1, if (i % 2 == 0) 0.5 else -0.5,
        0, 0, 0, 0, 0, 0))
    }

    def drive(base: String, compactEvery: Int): Seq[Long] = {
      val admittedDir = s"$base/admitted"
      val in = MemoryStream[(Long, Seq[Float])]
      val q = Pipelines.embedDupGate(
        in.toDF().toDF("vec_id", "embedding"),
        s"$base/index", s"$base/ckpt",
        out => out.write.mode("append").parquet(admittedDir),
        compactEvery = compactEvery).start()
      try {
        // seed vector 1 so the near-copies have something to collide with
        in.addData((1L, e1)); q.processAllAvailable()
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.read.parquet(admittedDir).select(col("vec_id"))
        .as[Long].collect().sorted.toSeq
    }

    val admittedC = drive(baseC, compactEvery = 3) // 13 batches >> 3-run budget
    val admittedU = drive(baseU, compactEvery = 0)
    assert(admittedC === admittedU, "compaction changed admit verdicts")

    val sigDir = new java.io.File(s"$baseC/index/sig")
    val runDirs = sigDir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(n => n.startsWith("run=") || n.startsWith("crun="))
    assert(runDirs.length <= 4, // compactEvery + 1
      s"run count not bounded: ${runDirs.mkString(", ")}")
  }
}
