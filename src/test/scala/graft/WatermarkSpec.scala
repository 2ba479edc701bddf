package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time watermark semantics (SURVEY.md §2.9 T3/T4 analogs): windowed
  * counts in append mode emit only when the watermark passes the window
  * end, and data later than the watermark is dropped — the event-time
  * equivalent of the reference's confirmation depth + 24h reprocess
  * cutoff.
  */
class WatermarkSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("windowed counts close with the watermark; later-than-watermark rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val counts = in.toDF().toDF("secs", "k")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))

    val q = counts.writeStream
      .format("memory").queryName("wincounts").outputMode("append").start()
    try {
      // window [0,10): three rows
      in.addData((1L, "a"), (2L, "b"), (9L, "c"))
      q.processAllAvailable()
      assert(spark.table("wincounts").count() === 0,
        "window emitted before the watermark passed it")

      // t=25 advances the watermark to 15 > 10 → window [0,10) closes
      in.addData((25L, "d"))
      q.processAllAvailable()
      // a late row at t=3 is behind the watermark → dropped, no re-emit
      in.addData((3L, "late"))
      q.processAllAvailable()
      // t=40 advances the watermark past [20,30) so that window closes too
      in.addData((40L, "e"))
      q.processAllAvailable()

      val got = spark.table("wincounts")
        .select(unix_timestamp(col("start")).as("s"), col("n"))
        .as[(Long, Long)].collect().toMap
      assert(got(0L) === 3L, "late row was counted or window miscounted")
      assert(got(20L) === 1L)
    } finally q.stop()
  }

  test("sliding windows stream: each event counts in width/slide = 2 windows; late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // the streaming form of w7_sliding_window: 10s windows every 5s
    val counts = in.toDF().toDF("secs", "k")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))

    val q = counts.writeStream
      .format("memory").queryName("slidecounts").outputMode("append").start()
    try {
      in.addData((7L, "a"), (8L, "b"))  // both in [0,10) and [5,15)
      q.processAllAvailable()
      in.addData((40L, "adv"))          // watermark → 30: closes both
      q.processAllAvailable()
      in.addData((6L, "late"))          // behind the watermark → dropped
      q.processAllAvailable()
      in.addData((60L, "adv2"))         // close [35,45) and [40,50)
      q.processAllAvailable()

      val got = spark.table("slidecounts")
        .select(unix_timestamp(col("start")).as("s"), col("n"))
        .as[(Long, Long)].collect().toMap
      assert(got(0L) === 2L && got(5L) === 2L,
        "events must appear in both overlapping windows exactly once each")
      assert(got(35L) === 1L && got(40L) === 1L, "advancing row miscounted")
      assert(!got.contains(10L), "no window should exist where no events fell")
    } finally q.stop()
  }
}
