package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Pipelines

/** Throughput smoke for the streaming admit gates: feeds the `documents`
  * table through [[Pipelines.nearDupGate]] (both probe modes) and the
  * `embeddings` table through [[Pipelines.embedDupGate]] in N
  * micro-batches (fresh index each) and prints one JSON line with
  * wall-clock and rows/s per mode. The corpus is collected once to feed
  * MemoryStream — that is the test harness's delivery mechanism, not the
  * gate's data path (the gate only ever sees per-batch DataFrames).
  * Usage: runMain graft.tools.GateBench [sfDir] [nBatches]
  */
object GateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val perBatch = math.max(1, docs.length / nBatches)

    def drive(shuffleProbe: Boolean): (Double, Long) = {
      val base = java.nio.file.Files.createTempDirectory("graft-gatebench").toString
      val in = MemoryStream[(Long, String)]
      var admitted = 0L
      val q = Pipelines.nearDupGate(
        in.toDF().toDF("doc_id", "text"),
        s"$base/index", s"$base/ckpt",
        out => admitted += out.count(),
        shuffleProbe = shuffleProbe).start()
      val t0 = System.nanoTime()
      try {
        docs.grouped(perBatch).foreach { g =>
          in.addData(g.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      ((System.nanoTime() - t0) / 1e9, admitted)
    }

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val perVBatch = math.max(1, vecs.length / nBatches)

    def driveEmbed(shuffleProbe: Boolean): (Double, Long) = {
      val base = java.nio.file.Files.createTempDirectory("graft-egatebench").toString
      val in = MemoryStream[(Long, Seq[Float])]
      var admitted = 0L
      val q = Pipelines.embedDupGate(
        in.toDF().toDF("vec_id", "embedding"),
        s"$base/index", s"$base/ckpt",
        out => admitted += out.count(),
        shuffleProbe = shuffleProbe).start()
      val t0 = System.nanoTime()
      try {
        vecs.grouped(perVBatch).foreach { g =>
          in.addData(g.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      ((System.nanoTime() - t0) / 1e9, admitted)
    }

    // the validation (quarantine) and frequency-sketch gates, same harness
    def driveQuarantine(): (Double, Long) = {
      val base = java.nio.file.Files.createTempDirectory("graft-qgatebench").toString
      val in = MemoryStream[(Long, String)]
      val checks = Seq(
        "text.not_null" -> col("text").isNotNull,
        "text.min_len" -> (length(col("text")) >= 10),
        "id.non_negative" -> (col("doc_id") >= 0))
      val q = graft.streaming.Quarantine.gate(
        in.toDF().toDF("doc_id", "text"), checks,
        s"$base/clean", s"$base/dlq")
        .option("checkpointLocation", s"$base/ckpt").start()
      val t0 = System.nanoTime()
      try {
        docs.grouped(perBatch).foreach { g =>
          in.addData(g.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val cleaned = spark.read.parquet(s"$base/clean").count()
      ((System.nanoTime() - t0) / 1e9, cleaned)
    }

    def driveSketch(): (Double, Long) = {
      val base = java.nio.file.Files.createTempDirectory("graft-sgatebench").toString
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.SketchStream.gate(
        in.toDF().toDF("doc_id", "text")
          .select(explode(split(col("text"), " ")).as("token")),
        s"$base/state")
        .option("checkpointLocation", s"$base/ckpt").start()
      val t0 = System.nanoTime()
      try {
        docs.grouped(perBatch).foreach { g =>
          in.addData(g.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val cells = graft.streaming.SketchStream.currentSketch(spark, s"$base/state").count()
      ((System.nanoTime() - t0) / 1e9, cells)
    }

    val (tB, aB) = drive(shuffleProbe = false)
    val (tS, aS) = drive(shuffleProbe = true)
    val (tE, aE) = driveEmbed(shuffleProbe = false)
    val (tES, aES) = driveEmbed(shuffleProbe = true)
    val (tQ, aQ) = driveQuarantine()
    val (tK, aK) = driveSketch()
    val n = docs.length
    val nv = vecs.length
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // scalastyle:off println
    println(s"""{"metric":"gate_docs_per_sec","docs":$n,"batches":$nBatches,""" +
      s""""broadcast":{"sec":${fmt(tB)},"admitted":$aB,"docs_per_sec":${fmt(n / tB)}},""" +
      s""""shuffle":{"sec":${fmt(tS)},"admitted":$aS,"docs_per_sec":${fmt(n / tS)}},""" +
      s""""embed":{"sec":${fmt(tE)},"vecs":$nv,"admitted":$aE,"vecs_per_sec":${fmt(nv / tE)}},""" +
      s""""embed_shuffle":{"sec":${fmt(tES)},"admitted":$aES,"vecs_per_sec":${fmt(nv / tES)}},""" +
      s""""quarantine":{"sec":${fmt(tQ)},"clean":$aQ,"docs_per_sec":${fmt(n / tQ)}},""" +
      s""""cms":{"sec":${fmt(tK)},"cells":$aK,"docs_per_sec":${fmt(n / tK)}},""" +
      s""""sf":"$sfDir"}""")
    // scalastyle:on println
    spark.stop()
  }
}
