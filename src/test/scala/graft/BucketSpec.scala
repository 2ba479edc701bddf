package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing co-locates join keys — the SURVEY §2/§7 scale claim that big
  * fact⨝fact joins pre-partitioned on the key skip their shuffle entirely.
  * Both sides are written bucketed+sorted by user_id; with broadcast
  * disabled, the sort-merge join over them must contain NO Exchange.
  */
class BucketSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join runs with zero Exchange") {
    val dir = Files.createTempDirectory("graft-buckets")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def writeBucketed(name: String, dfSel: org.apache.spark.sql.DataFrame): Unit =
      dfSel.write
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$dir/$name")
        .mode("overwrite")
        .saveAsTable(name)
    try {
      writeBucketed("bk_events", ev.select(col("user_id"), col("event_id"), col("value")))
      writeBucketed("bk_totals", ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n")))

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bk_events")
          .join(spark.table("bk_totals"), Seq("user_id"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_events")
      spark.sql("DROP TABLE IF EXISTS bk_totals")
    }
  }
}
