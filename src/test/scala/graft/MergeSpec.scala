package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Merge

/** Merge-operation unit vectors + the idempotency property every sink
  * relies on for effectively-once replay (SURVEY.md §2.9 T7: at-least-once
  * scheduling + natural-key upserts must make micro-batch replay a no-op).
  */
class MergeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def canon(df: DataFrame): Set[(Long, Long, String)] =
    df.select(col("k"), col("v"), col("s")).as[(Long, Long, String)].collect().toSet

  private lazy val target = Seq(
    (1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")).toDF("k", "v", "s")
  private lazy val updates = Seq(
    (2L, 99L, "B"), (4L, 40L, "d")).toDF("k", "v", "s")

  test("S6 upsert: updates replace matches, new keys insert") {
    val out = Merge.upsert(target, updates, Seq("k"))
    assert(canon(out) === Set((1L, 10L, "a"), (2L, 99L, "B"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("S6 upsert replay is idempotent (T7)") {
    val once = Merge.upsert(target, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    assert(canon(twice) === canon(once))
  }

  test("S7 setOnInsert: matched keeps non-update cols, insert gets defaults") {
    val out = Merge.upsertSetOnInsert(target, updates, Seq("k"),
      updateCols = Seq("v"), insertDefaults = Map("s" -> lit("NEW")))
    assert(canon(out) === Set((1L, 10L, "a"), (2L, 99L, "b"), (3L, 30L, "c"), (4L, 40L, "NEW")))
  }

  test("S8 insertIfAbsent: existing keys untouched") {
    val out = Merge.insertIfAbsent(target, updates, Seq("k"))
    assert(canon(out) === Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d")))
    assert(canon(Merge.insertIfAbsent(out, updates, Seq("k"))) === canon(out))
  }

  test("S9 updateIfExists: no insert for unmatched update keys") {
    val out = Merge.updateIfExists(target, updates, Seq("k"), Seq("v"))
    assert(canon(out) === Set((1L, 10L, "a"), (2L, 99L, "b"), (3L, 30L, "c")))
  }

  test("S10 deleteKeys removes every row of the drained keys") {
    val out = Merge.deleteKeys(target, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    assert(canon(out) === Set((1L, 10L, "a"), (3L, 30L, "c")))
  }

  test("P13 monotonic upsert: stale updates lose, target wins ties") {
    val t = Seq((1L, 5L, "t"), (2L, 5L, "t")).toDF("k", "ver", "s")
      .withColumnRenamed("ver", "v")
    val u = Seq((1L, 9L, "u"), (2L, 5L, "u"), (3L, 1L, "u")).toDF("k", "ver", "s")
      .withColumnRenamed("ver", "v")
    val out = Merge.upsertMonotonic(t, u, Seq("k"), "v")
    assert(canon(out) === Set((1L, 9L, "u"), (2L, 5L, "t"), (3L, 1L, "u")))
  }
}
