package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC candles — the streaming form of the `a8_ohlc` batch
  * report: tumbling event-time windows over a price stream, emitted in
  * APPEND mode so a bar leaves the engine exactly once, when the watermark
  * proves its window can no longer change — the "candle close" a market
  * feed consumer wants (an update-mode bar would re-emit on every late
  * tick; append mode IS the close semantics).
  *
  * open/close use min_by/max_by on the (ts, event_id) struct — the
  * order-insensitive formulation of first/last (streaming aggregation has
  * no row order to lean on; the reference's batch reports sort instead,
  * which a stream cannot). State per open window is seven scalars, bounded
  * by watermark expiry at any throughput.
  */
object Candles {

  /** prices(event_id, ts, value) → one finalized candle per `width` window.
    * `delay` is the lateness budget: ticks later than it are dropped, ticks
    * within it land in their (still-open) bar. */
  def ohlcStream(prices: DataFrame, width: String = "1 hour",
      delay: String = "10 minutes"): DataFrame =
    prices.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("window.start").as("bar_start"), col("open"), col("high"),
        col("low"), col("close"), col("volume"))
}
