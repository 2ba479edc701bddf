package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Candles

/** Streaming OHLC: append-mode close semantics, in-budget late ticks
  * amend the open bar, beyond-budget ticks are dropped.
  */
class CandlesOhlcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val ts = (s: Long) =>
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("bars finalize exactly once when the watermark passes window end") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Candles.ohlcStream(
        in.toDF().toDF("event_id", "ts", "value"),
        width = "1 hour", delay = "5 minutes")
      .writeStream.format("memory").queryName("candles")
      .outputMode("append").start()
    try {
      // hour bucket [0, 3600): out-of-arrival-order ticks — open/close must
      // follow EVENT time, not arrival
      in.addData((2L, ts(1800), 50.0), (1L, ts(60), 10.0), (3L, ts(3000), 30.0))
      q.processAllAvailable()
      assert(spark.table("candles").count() === 0, "bar must not emit while open")
      // a late tick inside the 5-minute budget still amends the open bar
      in.addData((4L, ts(2700), 99.0))
      q.processAllAvailable()
      // advance the watermark beyond 3600 + 5 min → bar [0,3600) closes
      in.addData((5L, ts(7500), 20.0))
      q.processAllAvailable()
      val bars = spark.table("candles")
        .select("bar_start", "open", "high", "low", "close", "volume")
        .as[(java.sql.Timestamp, Double, Double, Double, Double, Long)]
        .collect().sortBy(_._1.getTime)
      assert(bars.length === 1)
      val (_, o, h, l, c, v) = bars.head
      assert(o === 10.0, "open = earliest event-time tick")
      assert(h === 99.0 && l === 10.0)
      assert(c === 30.0, "close = latest event-time tick, not latest arrival")
      assert(v === 4L, "the in-budget late tick must count")
      // a tick WAY beyond the lateness budget for the closed bar is dropped
      in.addData((6L, ts(120), 1000.0))
      q.processAllAvailable()
      in.addData((7L, ts(12000), 20.0))
      q.processAllAvailable()
      val highs = spark.table("candles").select("high").as[Double].collect()
      assert(!highs.contains(1000.0), "beyond-budget tick must not resurrect the bar")
    } finally q.stop()
  }
}
