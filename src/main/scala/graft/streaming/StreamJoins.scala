package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins for the ingestion path.
  *
  * The reference enriches transactions with their receipts by per-tx lookup
  * (indexer/chain.py:49-64: fetch receipt, drop when missing, then keep only
  * `status == confirmed && confirmations >= min`). The batch form is
  * J9/S2 (`operators/EventPipeline.scala`); THIS is the streaming form: two
  * live streams joined with watermark-bounded state, so at cluster scale the
  * join state holds only the last `matchWindow` of either stream — the
  * poller's "receipt arrives a few blocks after the tx" lag — instead of the
  * whole history.
  *
  * Spark-first shape: `withWatermark` on BOTH sides plus a time-range join
  * condition is exactly what Structured Streaming needs to age out state
  * (without the range condition the state store grows unboundedly and the
  * query is rejected in append mode). The optional left-outer variant emits
  * the null-padded row once the watermark proves no receipt can still
  * arrive — the streaming analog of the reference's "missing receipt → drop
  * with log" branch, surfaced as data instead of a log line.
  */
object StreamJoins {

  /** Inner receipts⨝txs: schema contract
    * txs(txHash, blockNumber, txTime), receipts(rTxHash, status,
    * confirmations, rcptTime). A receipt matches only within
    * [txTime, txTime + matchWindow] — the state-retention bound.
    */
  def txReceiptJoin(txs: DataFrame, receipts: DataFrame,
      minConfirmations: Int = 1, delay: String = "10 minutes",
      matchWindow: String = "30 minutes"): DataFrame = {
    val t = txs.withWatermark("txTime", delay)
    val r = receipts.withWatermark("rcptTime", delay)
      .filter(col("status") === "confirmed" &&
        col("confirmations") >= lit(minConfirmations))
    t.join(r, expr(
      s"""txHash = rTxHash AND
         |rcptTime >= txTime AND rcptTime <= txTime + INTERVAL $matchWindow
         |""".stripMargin))
      .drop("rTxHash")
  }

  /** Left-outer variant: unmatched txs surface with null receipt columns
    * once the watermark passes txTime + matchWindow (the reference's
    * missing-receipt drop, as an auditable row). The confirmation filter
    * moves BEFORE the join (filtering after would turn a low-confirmation
    * receipt into a spurious "missing" only if it also removed the match —
    * pre-filtering keeps the two variants consistent: unmatched means no
    * QUALIFYING receipt arrived in the window).
    */
  def txReceiptJoinAudited(txs: DataFrame, receipts: DataFrame,
      minConfirmations: Int = 1, delay: String = "10 minutes",
      matchWindow: String = "30 minutes"): DataFrame = {
    val t = txs.withWatermark("txTime", delay)
    val r = receipts.withWatermark("rcptTime", delay)
      .filter(col("status") === "confirmed" &&
        col("confirmations") >= lit(minConfirmations))
    t.join(r, expr(
      s"""txHash = rTxHash AND
         |rcptTime >= txTime AND rcptTime <= txTime + INTERVAL $matchWindow
         |""".stripMargin), "leftOuter")
      .withColumn("receipt_seen", col("rTxHash").isNotNull)
      .drop("rTxHash")
  }
}
