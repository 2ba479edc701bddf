package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Quarantine

/** Dead-letter gate: per-row routing with reasons, batch never fails
  * wholesale, multi-violation rows carry every failed check name.
  */
class QuarantineStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val checks = Seq(
    "value.non_negative" -> (col("value") >= 0),
    "user.not_null" -> col("user_id").isNotNull,
    "type.allowed" -> col("event_type").isin("click", "view"))

  test("batch split: clean rows pass, violations carry every failed check") {
    val df = Seq(
      (1L, Option(10L), "click", 5.0),
      (2L, Option(11L), "view", -3.0),            // one violation
      (3L, None: Option[Long], "bogus", -1.0))    // three violations
      .toDF("event_id", "user_id", "event_type", "value")
    val (clean, dlq) = Quarantine.split(df, checks)
    assert(clean.select("event_id").as[Long].collect().toSeq === Seq(1L))
    val reasons = dlq.select(col("event_id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons(2L) === Seq("value.non_negative"))
    assert(reasons(3L).toSet ===
      Set("value.non_negative", "user.not_null", "type.allowed"))
  }

  test("streaming gate routes each micro-batch once: clean sink + DLQ with batch id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("quarantine").toString
    val in = MemoryStream[(Long, Long, String, Double)]
    val q = Quarantine.gate(
        in.toDF().toDF("event_id", "user_id", "event_type", "value"),
        checks, s"$dir/clean", s"$dir/dlq")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      in.addData((1L, 7L, "click", 1.0), (2L, 7L, "click", -9.0))
      q.processAllAvailable()
      in.addData((3L, 8L, "view", 2.0), (4L, 8L, "nope", 3.0))
      q.processAllAvailable()
      val clean = spark.read.parquet(s"$dir/clean")
        .select("event_id").as[Long].collect().toSet
      assert(clean === Set(1L, 3L))
      val dlq = spark.read.parquet(s"$dir/dlq")
        .select(col("event_id"), col("violations"), col("batch_id"))
        .as[(Long, Seq[String], Long)].collect()
      assert(dlq.map(_._1).toSet === Set(2L, 4L))
      assert(dlq.forall(_._2.nonEmpty))
      assert(dlq.map(_._3).toSet.size === 2, "batch ids must distinguish the batches")
    } finally q.stop()
  }
}
