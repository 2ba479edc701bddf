package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** Invariants for the warehouse-parity additions: SCD-2 history build,
  * snapshot CDC diff, inverted index.
  */
class WarehouseSpec extends AnyFunSuite {
  import SparkTestSession._

  test("s16_scd2_build: per-user interval chain is gapless with one open row") {
    val rows = QueryRegistry.byName("s16_scd2_build").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, hist) =>
      // output order is (user_id, valid_from, event_id) — already sorted
      assert(hist.count(_.getAs[Boolean]("is_current")) === 1,
        s"user $u must have exactly one open row")
      assert(hist.last.getAs[Boolean]("is_current"), s"user $u: open row must be last")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ===
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: history has a gap or overlap")
        case _ => ()
      }
    }
  }

  test("s17_snapshot_diff: one verdict per user, grow-only log never 'removed'") {
    val rows = QueryRegistry.byName("s17_snapshot_diff").fn(spark, sf).collect()
    val users = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length === users)
    assert(!rows.exists(_.getAs[String]("change_type") == "removed"))
    rows.foreach { r =>
      val ct = r.getAs[String]("change_type")
      assert(Seq("added", "changed", "unchanged").contains(ct))
      if (ct == "added") assert(r.getAs[String]("old_state") == null)
      else assert(r.getAs[String]("old_state") != null &&
        (ct == "changed") == (r.getAs[String]("old_state") != r.getAs[String]("new_state")))
    }
  }

  test("tx_inverted_index: bounded sorted posting head, exact df/tf stats") {
    val rows = QueryRegistry.byName("tx_inverted_index").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      // postings is the comma-joined ascending head (flat string so the
      // driver's hash compare stays array-free)
      val postings = r.getAs[String]("postings").split(',').map(_.toLong).toSeq
      assert(postings.length === math.min(df, 20L).toInt,
        "posting head is the min(df, 20) smallest doc_ids")
      assert(postings.toSeq === postings.sorted.toSeq)
      assert(postings.distinct.length === postings.length)
      assert(r.getAs[Long]("total_tf") >= df, "each posting contributes ≥1 occurrence")
    }
  }

  test("s18_gap_detect: gaps + processed ids tile [min,max] exactly, no overlap") {
    import org.apache.spark.sql.functions.col
    val gaps = QueryRegistry.byName("s18_gap_detect").fn(spark, sf).collect()
    val ids = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") =!= "error")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    val missing = gaps.map(r => r.getAs[Long]("gap_start") to r.getAs[Long]("gap_end"))
    missing.foreach(rng => assert(rng.nonEmpty, "empty gap range"))
    val nMissing = gaps.map(_.getAs[Long]("n_missing")).sum
    assert(nMissing === missing.map(_.size.toLong).sum)
    // tiling: |processed| + |missing| = max - min + 1
    assert(ids.length + nMissing === ids.last - ids.head + 1,
      "gaps must account for every absent id between min and max")
    assert(missing.flatten.toSet.intersect(ids.toSet).isEmpty,
      "a gap range must not contain a processed id")
  }

  test("tx_survivorship: survivor quality is the cluster max; members capped at 20") {
    val rows = QueryRegistry.byName("tx_survivorship").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getAs[String]("members").split(',').map(_.toLong).toSeq
      assert(members.length <= 20)
      assert(members.toSeq === members.sorted.toSeq)
      assert(r.getAs[Long]("n_members") >= members.length.toLong)
      assert(members.contains(r.getAs[Long]("survivor_id")) ||
        r.getAs[Long]("n_members") > 20L,
        "survivor must be a member (or the head was truncated past it)")
    }
  }
}
