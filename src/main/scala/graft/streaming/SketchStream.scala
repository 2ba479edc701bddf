package graft.streaming

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

  private def emptySketch(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0).as("j"), lit(0L).as("pos"), lit(0L).as("cnt"))
      .filter(lit(false))

  /** read the current sketch (empty frame if none committed yet). */
  def currentSketch(spark: SparkSession, dir: String): DataFrame =
    Generations.current(spark, dir).getOrElse(emptySketch(spark))

  /** one micro-batch's merge — the foreachBatch body, callable directly
    * (the spec drives an explicit replay through it). Replay idempotence
    * and marker monotonicity come from the shared [[Generations]]
    * protocol: merge input = the newest generation STRICTLY BEFORE this
    * batch id, commit never moves the marker backwards. */
  private[graft] def mergeBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val inc = Cms.cells(batch.select(col("token"),
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("h")))
    val merged = Generations.before(dir, batchId)
      .map(spark.read.parquet(_)).getOrElse(emptySketch(spark))
      .unionByName(inc)
      .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
    Generations.commit(merged, dir, batchId)
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
    val gen = Generations.latestDir(dir) match {
      case None => return tokens.map(_ -> 0L).toMap
      case Some(g) => g
    }
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
