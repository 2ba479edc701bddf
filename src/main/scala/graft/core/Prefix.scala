package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exclusive prefix sums over per-bucket totals tables — the
  * second pass of every two-pass global rank/cumsum in the engine
  * (`a6_running_count`, `tx_chunk_pack`, the console reports' running
  * Count).
  *
  * The naive shape is a `b2.bkt < b.bkt` range self-join on the totals
  * table: O(B²) in bucket count — harmless at days-per-corpus granularity,
  * quadratic by the time a 100 TB packing run has millions of buckets.
  * This version is two-level: buckets roll up into 256-wide SUPERBUCKETS,
  * the running sum inside each superbucket is a window bounded at 256 rows
  * per partition (never a single-partition funnel), and only the
  * superbucket totals (B/256 rows) pay a range self-join — O(B²/65536)
  * with the same zero-shuffle-of-the-data properties. A third level is
  * mechanical if B/256 ever gets large, but two levels cover 10^8 buckets
  * with a 1.5×10^5-pair join.
  */
object Prefix {

  /** append an `offset` column to `totals`: the exclusive prefix sum of
    * `totCol` over buckets ordered by `bktCol` within each `part` group.
    * `sb` must be a monotone 256-ish-wide coarsening of the bucket order
    * (e.g. `expr("bkt div 256")`, or a `unix_micros(...) div N` for
    * timestamp buckets). Output columns: part ++ (bktCol, offset). */
  def exclusiveCumsum(totals: DataFrame, part: Seq[String], bktCol: String,
      sb: Column, totCol: String): DataFrame = {
    val partCols = part.map(col)
    val t = totals.withColumn("bkt_sb", sb)
    val wLocal = Window
      .partitionBy(partCols :+ col("bkt_sb"): _*).orderBy(col(bktCol))
    val local = t.withColumn("cum_in_sb", sum(col(totCol)).over(wLocal))
    val superTotals = t.groupBy(partCols :+ col("bkt_sb"): _*)
      .agg(sum(col(totCol)).as("sb_tot"))
    val right = superTotals.select(
      part.map(p => col(p).as(s"${p}_2"))
        ++ Seq(col("bkt_sb").as("sb2"), col("sb_tot").as("sb_tot2")): _*)
    val cond = part.map(p => col(s"${p}_2") === col(p))
      .foldLeft(col("sb2") < col("bkt_sb"))(_ && _)
    val superOff = superTotals.join(right, cond, "left")
      .groupBy(partCols :+ col("bkt_sb"): _*)
      .agg(coalesce(sum(col("sb_tot2")), lit(0L)).as("sb_off"))
    local.join(broadcast(superOff), part :+ "bkt_sb")
      .withColumn("offset", col("sb_off") + col("cum_in_sb") - col(totCol))
      .select(partCols :+ col(bktCol) :+ col("offset"): _*)
  }
}
