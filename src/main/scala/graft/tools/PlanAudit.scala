package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.QueryRegistry

/** Registry-wide plan audit: executes every registered query once at a
  * small SF and writes one JSON line per query with the plan-quality
  * counters PlanSpec asserts pointwise — shuffle exchanges, broadcasts,
  * whole-stage-codegen spans, cartesian products, and pushed-filter
  * presence. The output (`plan_audit.json`) is the at-a-glance evidence
  * that the fleet's physical plans stay scale-shaped, and a diff of it
  * across rounds shows exactly which query's plan regressed.
  * Usage: runMain graft.tools.PlanAudit [sfDir] [outPath]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "plan_audit.json"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def count(p: String, needle: String): Int = {
      var (n, i) = (0, p.indexOf(needle))
      while (i >= 0) { n += 1; i = p.indexOf(needle, i + needle.length) }
      n
    }

    val lines = QueryRegistry.all.map { q =>
      try {
        val df = q.fn(spark, sfDir)
        df.collect() // finalize AQE so the executed plan is the real one
        val p = df.queryExecution.executedPlan.toString
        // codegen renders as "*(n)" operator prefixes, one id per
        // whole-stage span — count DISTINCT ids, not occurrences
        val codegenSpans =
          raw"\*\((\d+)\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
        val obj = Seq(
          "shuffles" -> (count(p, "Exchange hashpartitioning") +
            count(p, "Exchange rangepartitioning")),
          "broadcasts" -> count(p, "BroadcastExchange"),
          "codegen_spans" -> codegenSpans,
          // CartesianProduct is always a red flag; BroadcastNestedLoopJoin
          // is usually the benign physical of a broadcast 1-row scalar
          // crossJoin (the engine's documented pattern) — reported
          // separately so a diff can tell the two apart
          "cartesian" -> count(p, "CartesianProduct"),
          "bnlj" -> count(p, "BroadcastNestedLoopJoin"),
          "sorts" -> count(p, "Sort ["),
          "windows" -> count(p, "Window ["))
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        val pushed = p.contains("PushedFilters: [") && !p.contains("PushedFilters: []")
        s"""{"query":"${q.name}",$obj,"pushed_filters":$pushed}"""
      } catch { case e: Throwable =>
        s"""{"query":"${q.name}","error":"${String.valueOf(e.getMessage)
             .replaceAll("[\"\\\\\n\r\t]", " ").take(120)}"}"""
      }
    }
    Files.writeString(Paths.get(outPath), lines.mkString("\n") + "\n")
    // scalastyle:off println
    println(s"[plan-audit] ${lines.size} queries -> $outPath")
    // scalastyle:on println
    spark.stop()
  }
}
