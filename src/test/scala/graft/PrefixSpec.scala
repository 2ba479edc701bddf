package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Prefix

/** Two-level exclusive prefix sum: equality with the reference cumsum
  * across superbucket boundaries, with and without partition groups. */
class PrefixSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("exclusive cumsum equals the reference across superbucket boundaries") {
    // 1000 buckets → ~4 superbuckets of 256; values vary per bucket
    val totals = (0L until 1000L).map(b => (b, b % 7 + 1)).toDF("bkt", "tot")
    val got = Prefix.exclusiveCumsum(totals, Seq(), "bkt",
      expr("bkt div 256"), "tot")
      .orderBy(col("bkt")).as[(Long, Long)].collect()
    var running = 0L
    (0L until 1000L).zip(got).foreach { case (b, (gb, off)) =>
      assert(gb === b)
      assert(off === running, s"bucket $b: expected offset $running, got $off")
      running += b % 7 + 1
    }
  }

  test("partition groups keep independent prefix sums") {
    val totals = (for {
      g <- Seq("en", "de")
      b <- 0L until 600L
    } yield (g, b, if (g == "en") b + 1 else 2 * b + 1)).toDF("lang", "bkt", "tot")
    val got = Prefix.exclusiveCumsum(totals, Seq("lang"), "bkt",
      expr("bkt div 256"), "tot")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    def ref(f: Long => Long): Seq[Long] =
      (0L until 600L).scanLeft(0L)((acc, b) => acc + f(b)).dropRight(1)
    assert(got("en") === ref(_ + 1))
    assert(got("de") === ref(b => 2 * b + 1))
  }
}
