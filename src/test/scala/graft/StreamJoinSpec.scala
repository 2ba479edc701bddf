package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

/** Stream-stream receipts⨝txs (the streaming form of S2/J9): watermarked
  * two-sided join, time-range state bound, and the left-outer
  * missing-receipt audit row.
  */
class StreamJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val ts = (s: Long) =>
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("inner join matches receipts in-window and applies the confirmation gate") {
    implicit val sqlCtx = spark.sqlContext
    val txIn = MemoryStream[(String, Long, java.sql.Timestamp)]
    val rcIn = MemoryStream[(String, String, Int, java.sql.Timestamp)]
    val joined = StreamJoins.txReceiptJoin(
      txIn.toDF().toDF("txHash", "blockNumber", "txTime"),
      rcIn.toDF().toDF("rTxHash", "status", "confirmations", "rcptTime"),
      minConfirmations = 2)
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      txIn.addData(("a", 10L, ts(100)), ("b", 10L, ts(100)), ("c", 10L, ts(100)),
        ("d", 10L, ts(100)))
      q.processAllAvailable()
      rcIn.addData(
        ("a", "confirmed", 3, ts(200)),   // qualifies
        ("b", "confirmed", 1, ts(200)),   // under min confirmations
        ("c", "reverted", 5, ts(200)),    // wrong status
        ("d", "confirmed", 9, ts(100 + 3600))) // outside the 30-minute window
      q.processAllAvailable()
      val got = spark.table("ssj_inner").select("txHash").as[String].collect().toSeq
      assert(got === Seq("a"))
    } finally q.stop()
  }

  test("left-outer join emits the missing-receipt audit row after watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val txIn = MemoryStream[(String, Long, java.sql.Timestamp)]
    val rcIn = MemoryStream[(String, String, Int, java.sql.Timestamp)]
    val joined = StreamJoins.txReceiptJoinAudited(
      txIn.toDF().toDF("txHash", "blockNumber", "txTime"),
      rcIn.toDF().toDF("rTxHash", "status", "confirmations", "rcptTime"),
      minConfirmations = 1, delay = "1 minute", matchWindow = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      txIn.addData(("ok", 10L, ts(100)), ("orphan", 10L, ts(100)))
      rcIn.addData(("ok", "confirmed", 3, ts(150)))
      q.processAllAvailable()
      // advance BOTH watermarks far past txTime+window so the unmatched
      // state for "orphan" provably can no longer match and is emitted
      txIn.addData(("late-tick", 99L, ts(10000)))
      rcIn.addData(("late-tick", "confirmed", 1, ts(10000)))
      q.processAllAvailable()
      txIn.addData(("tick2", 99L, ts(20000)))
      rcIn.addData(("tick2", "confirmed", 1, ts(20000)))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer")
        .select(col("txHash"), col("receipt_seen")).as[(String, Boolean)]
        .collect().toMap
      assert(rows("ok") === true)
      assert(rows.contains("orphan"), "watermark-expired tx must surface")
      assert(rows("orphan") === false)
    } finally q.stop()
  }
}
