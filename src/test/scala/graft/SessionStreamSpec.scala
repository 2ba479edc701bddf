package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessions

/** Streaming session windows: gap-merge across micro-batches, append-mode
  * close, gap boundary splits.
  */
class SessionStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val ts = (s: Long) =>
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("sessions merge across batches and close once the gap is proven") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = Sessions.sessionize(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        gap = "30 minutes", delay = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two ticks 10 min apart (same session, split across batches);
      // user 2: one tick
      in.addData((1L, 1L, ts(0), 1.0), (2L, 10L, ts(0), 5.0))
      q.processAllAvailable()
      in.addData((1L, 2L, ts(600), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "open sessions must not emit")
      // user 1 again 45 min later: NEW session (gap 45m > 30m); this event
      // also advances the watermark enough to close nothing yet
      in.addData((1L, 3L, ts(3300), 4.0))
      q.processAllAvailable()
      // push the watermark far forward: all earlier sessions close
      in.addData((9L, 99L, ts(100000), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().sortBy(r => (r._1, r._2.getTime))
      val u1 = rows.filter(_._1 == 1L)
      assert(u1.length === 2, s"user 1 must have two closed sessions: ${rows.mkString}")
      assert(u1(0)._4 === 2L && u1(0)._5 === 3.0, "first session merges both ticks")
      assert(u1(0)._3.getTime === ts(600).getTime + 30 * 60 * 1000,
        "session end = last tick + gap")
      assert(u1(1)._4 === 1L && u1(1)._5 === 4.0)
      assert(rows.count(_._1 == 2L) === 1)
    } finally q.stop()
  }
}
