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
      val postings = r.getSeq[Long](r.fieldIndex("postings"))
      assert(postings.length === math.min(df, 20L).toInt,
        "posting head is the min(df, 20) smallest doc_ids")
      assert(postings.toSeq === postings.sorted.toSeq)
      assert(postings.distinct.length === postings.length)
      assert(r.getAs[Long]("total_tf") >= df, "each posting contributes ≥1 occurrence")
    }
  }
}
