package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAgg

/** MinHashAgg must agree exactly with the wide-aggregation signature the
  * dd_minhash_lsh query computes (same permutation formula, same ids) —
  * the typed-Aggregator path and the Column path are interchangeable.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val ids = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("l", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "array_distinct(CASE WHEN size(l) >= 3 THEN transform(sequence(1, size(l)-2), i -> concat_ws(' ', slice(l, i, 3))) ELSE cast(array() as array<string>) END)"))
        .as("shingle"))
    docs.select(col("doc_id"),
      (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast(LongType) % MinHashAgg.P)
        .as("sidp"))
  }

  test("Aggregator signature equals the wide-agg signature") {
    val viaAgg = ids.as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .collect().toMap

    val wide = ids.groupBy(col("doc_id")).agg(
      min((col("sidp") * (31 * 0 + 7) + (17 * 0 + 3)) % MinHashAgg.P).as("mh0"),
      (1 until MinHashAgg.K).map(k =>
        min((col("sidp") * (31 * k + 7) + (17 * k + 3)) % MinHashAgg.P).as(s"mh$k")): _*)
    val expected = wide.collect().map { r =>
      r.getLong(0) -> (0 until MinHashAgg.K).map(i => r.getLong(i + 1)).toArray
    }.toMap

    assert(viaAgg.keySet === expected.keySet)
    viaAgg.foreach { case (doc, sig) =>
      assert(sig.toSeq === expected(doc).toSeq, s"doc $doc signature mismatch")
    }
  }

  test("merge is commutative min (map-side partials are safe)") {
    val a = MinHashAgg.reduce(MinHashAgg.zero, 12345L)
    val b = MinHashAgg.reduce(MinHashAgg.zero, 999L)
    val ab = MinHashAgg.merge(a.clone(), b.clone()).toSeq
    val ba = MinHashAgg.merge(b.clone(), a.clone()).toSeq
    assert(ab === ba)
  }
}
