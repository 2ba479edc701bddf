package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Skew

/** saltedJoin must be a drop-in inner equi-join: identical results on a
  * pathologically skewed input (one key holding ~90% of rows), with the
  * hot key's rows actually scattered across salt sub-partitions.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val big = (1 to 1000).map { i =>
    val k = if (i <= 900) 7L else (i % 50).toLong // key 7 is hot
    (k, i.toLong)
  }.toDF("k", "payload")

  private lazy val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("salted join equals the plain join on skewed data") {
    val plain = big.join(dim, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, dim, "k", factor = 8)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 7L) >= 900) // the hot key dominates
  }

  test("the hot key scatters across multiple salts") {
    val salts = big.filter(col("k") === 7L)
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "hot key landed on a single salt — no scatter")
  }
}
