package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** The §3.2 derivation end-to-end in streaming mode: raw decoded logs
  * arrive in micro-batches, dispatch against a broadcast registry (P2/J8),
  * run the per-event column transform, and MERGE into a parquet state
  * table through the foreachBatch upsert sink — replays upsert rather
  * than duplicate (T7).
  */
final case class RawLog(event_id: Long, addr: String, event_name: String, amount: Long)

class PipelineE2ESpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("stream → dispatch → transform → keyed MERGE parquet state") {
    implicit val sqlCtx = spark.sqlContext
    val registry = Seq(("0xc0", "Mint", "h_mint"), ("0xc1", "Redeem", "h_redeem"))
      .toDF("addr", "event_name", "handler")
    val stateDir = Files.createTempDirectory("graft-e2e").toString + "/tx"
    val ckpt = Files.createTempDirectory("graft-e2e-ckpt").toString

    val in = MemoryStream[RawLog]
    val transformed = in.toDF()
      .join(broadcast(registry), Seq("addr", "event_name")) // dispatch = filter+route
      .withColumn("amount_wei", (col("amount") * 1000000000000L).cast("string"))
      .select("event_id", "handler", "amount_wei")

    val q = Pipelines.upsertSink(transformed, stateDir, Seq("event_id"), ckpt).start()
    try {
      in.addData(
        RawLog(1L, "0xc0", "Mint", 5L),
        RawLog(2L, "0xc1", "Redeem", 7L),
        RawLog(9L, "0xdead", "Unknown", 1L)) // unregistered → dropped
      q.processAllAvailable()
      in.addData(
        RawLog(1L, "0xc0", "Mint", 6L), // replay of key 1 with newer amount
        RawLog(3L, "0xc0", "Mint", 8L))
      q.processAllAvailable()
    } finally q.stop()

    val state = Pipelines.readState(spark, stateDir)
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state.keySet === Set(1L, 2L, 3L))
    assert(state(1L) === (("h_mint", "6000000000000")))
    assert(state(2L) === (("h_redeem", "7000000000000")))
    assert(state(3L) === (("h_mint", "8000000000000")))
  }

  test("stream → sparse per-event docs → CollectionSink keyed like the store") {
    import graft.core.Schemas
    import graft.streaming.{CollectionSink, ParquetDocumentSink}
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-e2e-coll").toString + "/Transaction"
    val ckpt = Files.createTempDirectory("graft-e2e-coll-ckpt").toString
    val sink = new CollectionSink(new ParquetDocumentSink(spark, dir), Schemas.transaction)

    // a per-event writer's sparse output: only its own fields, camelCase
    // per the Transaction collection schema
    val in = MemoryStream[RawLog]
    val docs = in.toDF().select(
      md5(col("event_id").cast("string")).as("transactionHash"),
      col("addr").as("address"),
      col("event_name").as("event"),
      (col("amount") * 1000000000000L).cast("string").as("amount"),
      lit(true).as("processLogs"),
      col("event_id")) // extra column: conformSparse must drop it

    val q = Pipelines.sinkTo(docs, Schemas.transaction.keys, ckpt,
      (batch, _) => sink.write(batch)).start()
    try {
      in.addData(
        RawLog(1L, "0xa1", "RiskProMint", 5L),
        RawLog(2L, "0xa2", "StableTokenRedeem", 7L))
      q.processAllAvailable()
      in.addData(RawLog(1L, "0xa1", "RiskProMint", 9L)) // same natural key → patch
      q.processAllAvailable()
    } finally q.stop()

    val out = Pipelines.readState(spark, dir)
    // full collection schema materialized; unset optionals are nulls
    assert(out.columns.toSeq === Schemas.transaction.schema.fieldNames.toSeq)
    val rows = out.collect().map(r =>
      (r.getAs[String]("address"), r.getAs[String]("event")) -> r).toMap
    assert(rows.size === 2, "one doc per (tx, address, event) natural key")
    assert(rows(("0xa1", "RiskProMint")).getAs[String]("amount") === "9000000000000")
    assert(rows(("0xa1", "RiskProMint")).getAs[Any]("bucket") == null)
  }
}
