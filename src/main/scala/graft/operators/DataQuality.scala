package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables => T}

/** Declarative data-quality constraint suite (the Deequ/dbt-tests layer a
  * production pipeline runs before trusting a load): each check reduces to
  * ONE bounded aggregate — a conditional count, a count-vs-distinct, or an
  * anti-join count — so the whole suite is a handful of map-side-combined
  * passes and 1-row frames at any table size; nothing driver-side but the
  * final ≤8-row report.
  *
  * The reference trusts its store implicitly (pymongo upserts, no
  * validation tier); an analytics engine reading lake files cannot — this
  * is the admission gate. `events.value.le_400` is deliberately strict so
  * the violation path is exercised on the clean testdata (the generator
  * emits values up to ~490): a suite that has never reported a nonzero
  * count is itself untested.
  */
object DataQuality {

  private def check(name: String, viol: DataFrame): DataFrame =
    viol.select(lit(name).as("check_name"), col("n_violations"),
      (col("n_violations") === 0).as("passed"))

  private def countWhere(df: DataFrame, pred: Column): DataFrame =
    // count(when(...)) — not sum(when/otherwise) — so an EMPTY table
    // reports 0 violations / passed=true like the oracle's count(*)
    // (sum over zero rows is NULL)
    df.agg(count(when(pred, 1L)).as("n_violations"))

  private def dupCount(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("n_violations"))

  private def orphanCount(child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  val queries: Seq[Q] = Seq(
    Q(
      "dq_checks",
      """SELECT *, n_violations = 0 AS passed FROM (
        |  SELECT 'documents.doc_id.unique' AS check_name,
        |    (SELECT count(*) - count(DISTINCT doc_id) FROM documents) AS n_violations
        |  UNION ALL SELECT 'events.event_id.unique',
        |    (SELECT count(*) - count(DISTINCT event_id) FROM events)
        |  UNION ALL SELECT 'events.event_type.allowed',
        |    (SELECT count(*) FROM events
        |     WHERE event_type NOT IN ('click','error','purchase','signup','view'))
        |  UNION ALL SELECT 'events.user_id.not_null',
        |    (SELECT count(*) FROM events WHERE user_id IS NULL)
        |  UNION ALL SELECT 'events.value.le_400',
        |    (SELECT count(*) FROM events WHERE value IS NULL OR value > 400)
        |  UNION ALL SELECT 'events.value.non_negative',
        |    (SELECT count(*) FROM events WHERE value IS NULL OR value < 0)
        |  UNION ALL SELECT 'lineitem.l_orderkey.ref_orders',
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'orders.o_custkey.ref_customer',
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      check("documents.doc_id.unique", dupCount(T.documents(s, d), "doc_id"))
        .unionAll(check("events.event_id.unique", dupCount(ev, "event_id")))
        .unionAll(check("events.event_type.allowed", countWhere(ev,
          !col("event_type").isin("click", "error", "purchase", "signup", "view"))))
        .unionAll(check("events.user_id.not_null",
          countWhere(ev, col("user_id").isNull)))
        .unionAll(check("events.value.le_400",
          countWhere(ev, col("value").isNull || col("value") > 400)))
        .unionAll(check("events.value.non_negative",
          countWhere(ev, col("value").isNull || col("value") < 0)))
        .unionAll(check("lineitem.l_orderkey.ref_orders",
          orphanCount(T.lineitem(s, d).select(col("l_orderkey")), "l_orderkey",
            T.orders(s, d), "o_orderkey")))
        .unionAll(check("orders.o_custkey.ref_customer",
          orphanCount(T.orders(s, d).select(col("o_custkey")), "o_custkey",
            T.customer(s, d), "c_custkey")))
        .orderBy(col("check_name"))
    }
  )
}
