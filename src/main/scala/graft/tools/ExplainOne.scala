package graft.tools

/** Dev utility: print the executed plan of one registered query.
  * `runMain graft.tools.ExplainOne <queryName> [sfDir]`
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val df = graft.core.QueryRegistry.byName(name).fn(spark, dir)
      df.collect()
      // scalastyle:off println
      println(df.queryExecution.executedPlan.toString)
      // warm re-run wall clock (fresh plan, warm JIT/page cache)
      val t0 = System.nanoTime()
      graft.core.QueryRegistry.byName(name).fn(spark, dir).collect()
      println(f"[warm] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // scalastyle:on println
    } finally spark.stop()
  }
}
