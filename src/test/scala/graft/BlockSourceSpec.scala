package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-blocks DataSource V2 connector: batch mode serves the forced
  * range; micro-batch mode pages through the chain in blocksPerTrigger
  * steps, stops at head − recession, delivers every block exactly once,
  * and parallelizes each range across `slices` partitions.
  */
class BlockSourceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("batch read serves [startBlock, head - recession] with parallel slices") {
    val df = spark.read.format("graft-blocks")
      .option("headBlock", "102").option("recession", "2")
      .option("startBlock", "5").option("slices", "4").load()
    val rows = df.select(col("blockNumber"), spark_partition_id().as("pid"))
      .as[(Long, Int)].collect()
    assert(rows.map(_._1).sorted.toSeq === (5L to 100L))
    assert(rows.map(_._2).distinct.length === 4, "range did not split across slices")
  }

  test("micro-batch stream pages by blocksPerTrigger and is exactly-once") {
    val ckpt = Files.createTempDirectory("graft-blocks-ckpt").toString
    val stream = spark.readStream.format("graft-blocks")
      .option("headBlock", "97").option("recession", "2")
      .option("blocksPerTrigger", "10").option("slices", "2").load()
    val q = stream.writeStream
      .format("memory").queryName("blocks").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // processAllAvailable only drains data available at call time (one
      // page, by design of the pacing); poll until the head is reached.
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("blocks").count() < 96 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally q.stop()
    val got = spark.table("blocks").select("blockNumber").as[Long].collect()
    assert(got.sorted.toSeq === (0L to 95L), "missing or extra blocks")
    assert(got.length === got.distinct.length, "duplicate delivery")
    // ≥10 micro-batches for 96 blocks at 10/trigger — pacing was honored
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3, "pacing not exercised")
  }

  test("block content is deterministic (same block → same row)") {
    val a = spark.read.format("graft-blocks").option("headBlock", "12").load().collect()
    val b = spark.read.format("graft-blocks").option("headBlock", "12").load().collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
