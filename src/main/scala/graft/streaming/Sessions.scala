package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the streaming form of the batch
  * `w6_session_window` query, on Spark's NATIVE session_window aggregation:
  * per-user sessions close when the event-time gap exceeds `gap`, and the
  * closed session emits exactly once in append mode, when the watermark
  * proves no in-gap event can still arrive. This is the
  * dynamic-gap-windowing the reference's poller cannot express at all (it
  * re-queries; a session over 100 TB of events needs the state machine) —
  * and using the built-in beats hand-rolling flatMapGroupsWithState: the
  * state store merges adjacent windows, handles out-of-order ticks, and
  * participates in watermark cleanup for free.
  */
object Sessions {

  /** events(user_id, event_id, ts, value) → one row per CLOSED session:
    * (user_id, session_start, session_end, n_events, total_value). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
}
