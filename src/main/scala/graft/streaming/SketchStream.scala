package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters.IteratorHasAsScala

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cms

/** Streaming Count-Min sketch maintenance — the frequency state a live
  * ingestion keeps without ever holding the vocabulary: each micro-batch's
  * token stream reduces to ≤4096 (j, pos, cnt) increments (the shared
  * graft.functions.Cms construction), which MERGE into the persisted
  * sketch by plain summation — the CMS's defining property. State size is
  * constant in both corpus and vocabulary; a 100 TB stream's frequency
  * oracle is 32 KB.
  *
  * Generation protocol (the bucketed-upsert discipline): each batch writes
  * the merged sketch to a fresh `gen=<batchId>` directory and then
  * atomically moves a marker file pointing at it. Replaying a batch
  * rewrites the same generation from the same previous state — the merge
  * is idempotent per batch id, so at-least-once delivery never
  * double-counts.
  */
object SketchStream {

  private def markerPath(dir: String) = Paths.get(dir, "LATEST")

  /** generation number the marker currently points at, if any. */
  private def markerGen(dir: String): Option[Long] = {
    val m = markerPath(dir)
    if (!Files.exists(m)) None
    else {
      val p = Files.readString(m).trim
      val i = p.lastIndexOf("gen=")
      if (i < 0) None else p.drop(i + 4).toLongOption
    }
  }

  private def emptySketch(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0).as("j"), lit(0L).as("pos"), lit(0L).as("cnt"))
      .filter(lit(false))

  /** the newest COMMITTED generation strictly before `batchId` — the merge
    * input that makes a batch replay idempotent: re-running batch N starts
    * from the state BEFORE N (never from its own output, which would
    * double-count) and overwrites gen=N with identical content. */
  private def sketchBefore(spark: SparkSession, dir: String, batchId: Long): DataFrame = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return emptySketch(spark)
    val gens = scala.util.Using.resource(Files.list(d)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("gen=") => s.drop(4).toLong }
        .filter(_ < batchId).toSeq
    }
    if (gens.isEmpty) emptySketch(spark)
    else spark.read.parquet(s"$dir/gen=${gens.max}")
  }

  /** read the current sketch (empty frame if none committed yet). */
  def currentSketch(spark: SparkSession, dir: String): DataFrame = {
    val m = markerPath(dir)
    if (Files.exists(m)) spark.read.parquet(Files.readString(m).trim)
    else emptySketch(spark)
  }

  /** one micro-batch's merge — the foreachBatch body, callable directly
    * (the spec drives an explicit replay through it). */
  private[graft] def mergeBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val inc = Cms.cells(batch.select(col("token"),
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("h")))
    val merged = sketchBefore(spark, dir, batchId)
      .unionByName(inc)
      .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
    val genDir = s"$dir/gen=$batchId"
    merged.write.mode("overwrite").parquet(genDir)
    // never move the marker BACKWARDS: a replay of an old batch id after
    // newer generations committed rewrites its gen dir (idempotent) but
    // must not regress currentSketch to stale state
    val current = markerGen(dir)
    if (current.forall(batchId >= _)) {
      val tmp = Paths.get(dir, s".LATEST.$batchId")
      Files.createDirectories(Paths.get(dir))
      Files.writeString(tmp, genDir)
      Files.move(tmp, markerPath(dir), StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** wire a token stream (one `token` string column) into the sketch dir. */
  def gate(tokens: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    tokens.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, dir, batchId)
    }

  /** point estimates for candidate tokens against the live sketch. */
  def estimate(spark: SparkSession, dir: String, tokens: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    val cand = tokens.toDF("token")
      .withColumn("h", conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    Cms.estimate(cand, currentSketch(spark, dir))
      .select(col("token"), col("cms_est"))
      .as[(String, Long)].collect().toMap
  }

  /** SERVING fast path: same estimates as [[estimate]], no Spark job. The
    * sketch is ≤4096 (j,pos,cnt) cells — 32 KB — by construction, so a
    * serving tier caches it on the driver PER GENERATION (the marker
    * content is the cache key; a micro-batch commit moves the marker and
    * invalidates) and answers point lookups with pure arithmetic: the same
    * md5-derived 60-bit id, the same disjoint 10-bit row positions, min
    * over the d=4 cells, absent cell = 0. One parquet read per generation
    * amortizes over every request served against that generation. */
  private val servingCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Map[(Int, Long), Long])]()
  def estimateServing(spark: SparkSession, dir: String, tokens: Seq[String]): Map[String, Long] = {
    val m = markerPath(dir)
    if (!Files.exists(m)) return tokens.map(_ -> 0L).toMap
    val gen = Files.readString(m).trim
    val cells = servingCache.compute(dir, (_, prev) =>
      if (prev != null && prev._1 == gen) prev
      else (gen, spark.read.parquet(gen).collect()
        .map(r => (r.getAs[Int]("j"), r.getAs[Long]("pos")) -> r.getAs[Long]("cnt"))
        .toMap))._2
    tokens.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      t -> (0 until Cms.Rows)
        .map(j => cells.getOrElse((j, (h >> (Cms.Bits * j)) & Cms.Mask), 0L))
        .min
    }.toMap
  }
}
