package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.core.Merge

/** Streaming shell building blocks — SURVEY.md §2.9: reorg margin (T2),
  * dirty-set changelog (T6), and the idempotent keyed upsert sink that
  * turns at-least-once micro-batch delivery into effectively-once table
  * state (T7 = S6 inside foreachBatch).
  */
object Pipelines {

  /** T2 reorg safety margin (scan_raw_txs.py:74-80): never index within
    * `recession` blocks of the chain head. `headCol` is the per-row
    * observed head (the stream source stamps it). */
  def reorgSafe(df: DataFrame, blockCol: String, headCol: String,
      recession: Long = 2L): DataFrame =
    df.filter(col(blockCol) <= col(headCol) - recession)

  /** T6 dirty-set changelog (moc_balances.py:174-188 → scan_moc_user.py:
    * 44-70): collapse the stream of touched accounts to at-most-once per
    * key per micro-batch window; the downstream recompute join consumes
    * this. On an unbounded stream, watermark before deduplicating. */
  def dirtySet(updates: DataFrame, keyCol: String): DataFrame =
    updates.select(col(keyCol)).dropDuplicates(Seq(keyCol))

  /** S8 in streaming form: drop re-delivered rows (at-least-once sources
    * re-emit a raw log on poller overlap or restart; the reference absorbs
    * them with Mongo insert-if-absent, scan_raw_txs.py:51-54) BEFORE any
    * stateful stage, keyed by the natural event identity. State is
    * BOUNDED: `dropDuplicatesWithinWatermark` evicts seen-keys older than
    * the watermark, so the dedup map never grows with the chain — a plain
    * `dropDuplicates` on an unbounded stream would leak one entry per
    * event forever (the 100 TB failure mode). */
  def dedupStream(stream: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** T7/S6: one idempotent micro-batch application — MERGE the batch into
    * the parquet-backed state table by natural key (updates win), with a
    * write-to-temp + swap so the target is never half-written. Replaying
    * the same batch is a no-op on table contents, which is what makes
    * at-least-once delivery effectively-once (the reference relies on the
    * same property via Mongo natural-key upserts, scan_raw_txs.py:51-54).
    */
  def upsertBatch(spark: SparkSession, stateDir: String,
      batch: DataFrame, keys: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val state = new Path(stateDir)
    val tmp = new Path(stateDir + ".__tmp")
    val fs = state.getFileSystem(conf)
    val merged =
      if (fs.exists(state)) Merge.upsert(spark.read.parquet(stateDir), batch, keys)
      else batch
    // materialize to tmp BEFORE touching the live dir (merged lazily reads
    // it). The delete+rename swap is not crash-atomic — a failure between
    // the two loses the live dir (the checkpoint replays the batch, but a
    // reader could observe the gap). Production targets a transactional
    // table format (Delta MERGE) or Mongo upserts behind DocumentSink,
    // where the swap problem doesn't exist; this parquet sink is the
    // self-contained test-environment implementation.
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(state, true)
    fs.rename(tmp, state)
  }

  /** the streaming wiring of upsertBatch: foreachBatch keyed MERGE sink. */
  def upsertSink(stream: DataFrame, stateDir: String, keys: Seq[String],
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    sinkTo(stream, keys, checkpointDir,
      (batch, ks) => upsertBatch(batch.sparkSession, stateDir, batch, ks))

  /** generic foreachBatch wiring over any [[DocumentSink]]. */
  def sinkTo(stream: DataFrame, keys: Seq[String], checkpointDir: String,
      sink: (DataFrame, Seq[String]) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(batch.toDF(), keys)
      }
}

/** Keyed document-store boundary — the reference's 16 MongoDB collections
  * (SURVEY.md §1.3) sit behind this one seam so the derivation pipelines
  * never see the storage system. [[ParquetDocumentSink]] is the in-repo
  * implementation (and the test double). A MongoDB implementation does
  * the same `upsert` with per-partition bulk `replaceOne(upsert=true)`
  * writes keyed by the same natural keys — no driver ships in this
  * zero-egress environment, so it lives out of tree behind this trait.
  */
trait DocumentSink {
  /** idempotently apply one micro-batch keyed by `keys` (updates win). */
  def upsert(batch: DataFrame, keys: Seq[String]): Unit
}

final class ParquetDocumentSink(spark: SparkSession, stateDir: String)
    extends DocumentSink {
  override def upsert(batch: DataFrame, keys: Seq[String]): Unit =
    Pipelines.upsertBatch(spark, stateDir, batch, keys)
}

/** A [[DocumentSink]] bound to one catalog collection
  * ([[graft.core.Schemas]]): every batch is conformed to the declared
  * schema (sparse-document semantics — missing optional fields become
  * typed nulls, a missing key/required field fails loudly, extra columns
  * are dropped) and upserted by the collection's OWN natural key — the
  * unique index mongo_manager.py declares — so callers can't key a
  * collection wrongly. The reference gets this pairing implicitly from
  * each writer's update filter; here it is one object per collection. */
final class CollectionSink(inner: DocumentSink, c: graft.core.Collection) {
  require(c.keys.nonEmpty, s"${c.name} is a single-document collection; " +
    "upsert it with an explicit constant key column")
  def write(batch: DataFrame): Unit =
    inner.upsert(graft.core.Schemas.conformSparse(batch, c), c.keys)
}
