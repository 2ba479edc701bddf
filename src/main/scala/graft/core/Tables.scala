package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and resolves its
  * inputs through here so that filter pushdown / column pruning reach the
  * parquet scan unimpeded (no caching layer in between — Catalyst sees the
  * `FileSourceScanExec` directly).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). We read nanos as Long
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds —
    * exactly what DuckDB does when it reads the same file (verified: its
    * TIMESTAMP(NANOS) parquet read yields µs TIMESTAMP, truncating), so the
    * oracle compare sees identical values.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // The flag is set at session-build time by Verify/Bench/tests (the
    // loader stays pure there); this set is a defensive no-op for sessions
    // built outside the engine's entry points, where the alternative is a
    // hard PARQUET_TYPE_ILLEGAL failure. It is idempotent (same value every
    // time), so reads cannot become order-dependent on it.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d).withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
