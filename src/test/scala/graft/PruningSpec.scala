package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — the scan-reduction mechanism that replaces the
  * reference's block-range scoping at 100 TB: a blockRange/date-partitioned
  * table must prune statically for literal predicates and dynamically
  * (DPP) when the partition key arrives from a filtered dimension join.
  */
class PruningSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-part").toString + "/orders"
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(d)
    d
  }

  test("static pruning: a literal partition predicate reaches PartitionFilters") {
    val df = spark.read.parquet(dir).filter(col("o_year") === 1995)
      .select(col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter missing:\n$plan")
    assert(df.count() > 0)
  }

  test("dynamic partition pruning fires for a filtered-dimension join") {
    val fact = spark.read.parquet(dir)
    // the dim must be a file scan: a LocalRelation folds its filter at
    // planning time and DPP never considers it
    val dimPath = Files.createTempDirectory("graft-dim").toString + "/years"
    (1992 to 1998).map(y => (y, if (y == 1995) "keep" else "drop"))
      .toDF("dim_year", "flag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact
      .join(dim.filter(col("flag") === "keep"), col("o_year") === col("dim_year"))
      .select(col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"DPP subquery missing from plan:\n$plan")
    // only the kept year's partition contributes rows
    val expected = fact.filter(col("o_year") === 1995).count()
    assert(joined.count() === expected)
  }
}
