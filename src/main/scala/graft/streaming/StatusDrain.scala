package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STATUS-UPDATE loop — the reference's `scan_transactions_status`
  * task (tx status re-derived as the chain head advances,
  * scan_tx_status.py / S4's unprocessed-rows scan): a Transaction row is
  * stamped `confirming` at WRITE time and must flip to `confirmed` once
  * `head - event_id > depth`, even though no new event for it will ever
  * arrive. Rescanning the whole table per tick is the wrong shape at any
  * scale, so the loop keeps a PENDING QUEUE sized to the confirmation
  * window:
  *
  *  - [[appendPending]] (called by the ingest task after its upsert)
  *    appends the batch's still-`confirming` keys to a small single-dir
  *    generation state — O(batch).
  *  - [[drain]] (its own task at the reference's 10 s status cadence)
  *    reads the queue, selects the now-ripe keys, rewrites ONLY the state
  *    buckets those keys hash into (`Pipelines.readStateBuckets` — the
  *    bucketed layout paying off on the read side), and removes the
  *    drained keys from the queue — O(window), never O(history).
  *
  * Both sides are idempotent: re-appending a key is deduplicated,
  * re-draining a ripe key rewrites the same `confirmed` row, and a crash
  * between the Transaction upsert and the queue rewrite only means the
  * key drains again next tick.
  */
object StatusDrain {

  /** Transaction natural key — must match the ingest task's upsert keys. */
  val Keys = Seq("event_id", "event", "address")

  /** confirmation depth: `head - event_id > Depth` ⇒ confirmed — the SAME
    * threshold EventUnion.canonical stamps at write time. */
  val Depth = 10

  def pendingDir(stateRoot: String): String = s"$stateRoot/_status_pending"

  /** enqueue the batch's not-yet-confirmed keys (dedup on replay). */
  def appendPending(spark: SparkSession, stateRoot: String, txBatch: DataFrame): Unit = {
    val inc = txBatch.filter(col("status") === "confirming")
      .select(Keys.map(col): _*)
    Pipelines.swapSmallState(spark, pendingDir(stateRoot)) {
      case Some(cur) => cur.unionByName(inc).dropDuplicates(Keys)
      case None => inc.dropDuplicates(Keys)
    }
  }

  /** flip every ripe pending row to `confirmed` and shrink the queue.
    * `bucketing` must match the Transaction state's layout (range on
    * event_id makes the drain's window RANGE-LOCAL: ripe keys live in the
    * tail buckets by construction). Returns the number of rows flipped.
    * `writer` must be the SAME token the ingest task upserts under: both
    * tasks write the one Transaction table, so they share ownership (the
    * per-root JVM lock serializes them; a FOREIGN token would fail the
    * lease loudly instead of interleaving with the ingest's staging). */
  def drain(spark: SparkSession, stateRoot: String, head: Long,
      bucketing: Option[Pipelines.Bucketing] = None,
      writer: String = Pipelines.AdhocWriter): Long = {
    val bk = bucketing.getOrElse(Pipelines.Bucketing.hash())
    val pending = Pipelines.readSmallState(spark, pendingDir(stateRoot))
      .getOrElse(return 0L)
    val ripe = pending.filter(lit(head) - col("event_id") > Depth).persist()
    val nRipe = ripe.count()
    if (nRipe > 0) {
      val buckets = ripe.select(bk.exprOf(Keys).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      Pipelines.readStateBuckets(spark, s"$stateRoot/Transaction", buckets)
        .foreach { touched =>
          val flipped = touched.join(ripe, Keys, "left_semi")
            .withColumn("status", lit("confirmed"))
          Pipelines.upsertBatch(spark, s"$stateRoot/Transaction", flipped, Keys,
            bucketing = bucketing, writer = writer)
        }
      Pipelines.swapSmallState(spark, pendingDir(stateRoot)) {
        case Some(cur) => cur.join(ripe, Keys, "left_anti")
        case None => ripe.limit(0).select(Keys.map(col): _*)
      }
    }
    ripe.unpersist()
    nRipe
  }
}
