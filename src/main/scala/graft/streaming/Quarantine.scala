package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter routing — the streaming face of the dq_checks admission
  * gate: every micro-batch is tagged with the names of the checks it
  * fails, clean rows continue to the main sink, violating rows land in a
  * quarantine sink WITH their reasons (the "dead-letter queue" pattern —
  * dropping bad rows silently destroys the evidence an operator needs;
  * failing the whole batch holds good data hostage to one bad row).
  *
  * The tag is ONE narrow projection (an array of failed check names per
  * row, no shuffle); the split is two filters over the same tagged frame,
  * executed inside foreachBatch so each micro-batch is read once and
  * written twice. Check predicates state VALIDITY (true = keep), matching
  * dq_checks' orientation.
  */
object Quarantine {

  /** append a `violations: array<string>` column: the names of every
    * failed check (empty array = clean row). */
  def tag(df: DataFrame, checks: Seq[(String, Column)]): DataFrame =
    df.withColumn("violations", array_compact(array(
      checks.map { case (name, valid) =>
        when(!coalesce(valid, lit(false)), lit(name)) }: _*)))

  /** split a (batch) frame into (clean — violations dropped, quarantined —
    * violations kept). */
  def split(df: DataFrame, checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val tagged = tag(df, checks)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** wire a streaming frame through the gate: clean rows append to
    * `cleanDir`, violations (with reasons and the batch id) to `dlqDir`.
    * One read, two writes per micro-batch; parquet appends are the
    * at-least-once baseline — the effectively-once upsert sink
    * (Pipelines.DocumentSink) composes downstream of the clean path when
    * replay-dedup is required. */
  def gate(stream: DataFrame, checks: Seq[(String, Column)],
      cleanDir: String, dlqDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val tagged = tag(batch, checks).persist()
      try {
        tagged.filter(size(col("violations")) === 0).drop("violations")
          .write.mode("append").parquet(cleanDir)
        val dlq = tagged.filter(size(col("violations")) > 0)
          .withColumn("batch_id", lit(batchId))
        if (!dlq.isEmpty) dlq.write.mode("append").parquet(dlqDir)
      } finally tagged.unpersist()
    }
}
