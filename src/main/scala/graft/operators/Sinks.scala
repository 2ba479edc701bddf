package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.{Merge, Q, Tables => T}

/** Sink/MERGE semantics — SURVEY.md §2.1 S6-S12 — exercised end-to-end as
  * batch queries with DuckDB oracles. Each query builds a keyed state table
  * ("UserState": latest event per user before a cut) and an update batch
  * (latest per user after the cut) from `events`, applies one
  * graft.core.Merge operation, and returns the post-write table — exactly
  * what the reference's Mongo writers leave behind
  * (indexer/mongo_manager.py upsert modes).
  *
  * Scale: the split/top-1 stages are one window shuffle on user_id; every
  * Merge op is one key-partitioned join. Nothing here collects or loops.
  */
object Sinks {

  /** cut = max(ts) − 2 days; state = latest (user_id, event_id, value) per
    * user strictly before the cut, updates = latest at/after the cut. */
  private def stateAndUpdates(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = T.events(s, d)
    val cut = ev.agg((max(col("ts")) - expr("INTERVAL 2 DAY")).as("c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    def top1(half: DataFrame): DataFrame = half
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("value"))
    val withCut = ev.crossJoin(broadcast(cut))
    (top1(withCut.filter(col("ts") < col("c"))),
      top1(withCut.filter(col("ts") >= col("c"))))
  }

  /** oracle CTEs mirroring stateAndUpdates. */
  private val StateCte =
    """WITH cut AS (SELECT MAX(ts) - INTERVAL 2 DAY AS c FROM events),
      |t AS (SELECT user_id, event_id, value FROM (
      |  SELECT e.user_id, e.event_id, e.value,
      |    ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) rn
      |  FROM events e, cut WHERE e.ts < cut.c) WHERE rn = 1),
      |u AS (SELECT user_id, event_id, value FROM (
      |  SELECT e.user_id, e.event_id, e.value,
      |    ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) rn
      |  FROM events e, cut WHERE e.ts >= cut.c) WHERE rn = 1)""".stripMargin

  val queries: Seq[Q] = Seq(

    // S6 keyed upsert, updates win (scan_raw_txs.py:51-54): the post-write
    // UserState after replaying the update batch.
    Q(
      "s6_upsert_latest",
      s"""$StateCte
         |SELECT COALESCE(u.user_id, t.user_id) AS user_id,
         |  CASE WHEN u.user_id IS NULL THEN t.event_id ELSE u.event_id END AS event_id,
         |  CASE WHEN u.user_id IS NULL THEN t.value ELSE u.value END AS value
         |FROM t FULL JOIN u ON t.user_id = u.user_id
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val (state, updates) = stateAndUpdates(s, d)
      Merge.upsert(state, updates, Seq("user_id")).orderBy(col("user_id"))
    },

    // S7 $set + $setOnInsert (mocsettlement.py:388-392): matches refresh
    // (event_id, value) but keep the existing `seen` counter; inserts seed
    // seen = 0.
    Q(
      "s7_set_on_insert",
      s"""$StateCte,
         |ts AS (SELECT user_id, event_id, value, event_id % 5 AS seen FROM t)
         |SELECT ts.user_id,
         |  CASE WHEN u.user_id IS NULL THEN ts.event_id ELSE u.event_id END AS event_id,
         |  CASE WHEN u.user_id IS NULL THEN ts.value ELSE u.value END AS value,
         |  ts.seen
         |FROM ts LEFT JOIN u ON ts.user_id = u.user_id
         |UNION ALL
         |SELECT u.user_id, u.event_id, u.value, 0 AS seen
         |FROM u LEFT JOIN ts ON ts.user_id = u.user_id WHERE ts.user_id IS NULL
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val (state0, updates) = stateAndUpdates(s, d)
      val state = state0.withColumn("seen", col("event_id") % 5)
      Merge.upsertSetOnInsert(state, updates, Seq("user_id"),
          updateCols = Seq("event_id", "value"),
          insertDefaults = Map("seen" -> lit(0L)))
        .orderBy(col("user_id"))
    },

    // S8 insert-if-absent (mocsettlement.py:29-52 dedup guard): existing
    // keys keep their state row; only brand-new users append.
    Q(
      "s8_insert_if_absent",
      s"""$StateCte
         |SELECT user_id, event_id, value FROM t
         |UNION ALL
         |SELECT u.user_id, u.event_id, u.value FROM u
         |WHERE u.user_id NOT IN (SELECT user_id FROM t)
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val (state, updates) = stateAndUpdates(s, d)
      Merge.insertIfAbsent(state, updates, Seq("user_id")).orderBy(col("user_id"))
    },

    // S9 conditional update, no upsert (fastbtcbridge.py:69-72 status
    // patch): rows with a pending update flip to 'confirmed'; update rows
    // without a state row are dropped.
    Q(
      "s9_update_if_exists",
      s"""$StateCte,
         |ts AS (SELECT user_id, event_id,
         |         CASE WHEN event_id % 2 = 0 THEN 'confirming' ELSE 'pending' END AS status
         |       FROM t),
         |us AS (SELECT user_id, 'confirmed' AS status FROM u)
         |SELECT ts.user_id, ts.event_id,
         |  CASE WHEN us.user_id IS NULL THEN ts.status ELSE us.status END AS status
         |FROM ts LEFT JOIN us ON ts.user_id = us.user_id
         |ORDER BY ts.user_id""".stripMargin) { (s, d) =>
      val (state0, updates0) = stateAndUpdates(s, d)
      val state = state0.select(col("user_id"), col("event_id"),
        when(col("event_id") % 2 === 0, "confirming").otherwise("pending").as("status"))
      val updates = updates0.select(col("user_id"), lit("confirmed").as("status"))
      Merge.updateIfExists(state, updates, Seq("user_id"), Seq("status"))
        .orderBy(col("user_id"))
    },

    // S10 retention delete (mocsettlement.py:420-429: compound
    // age+predicate delete_many): drop clicks older than 3 days before the
    // head; the post-delete per-type profile.
    Q(
      "s10_retention_delete",
      """WITH cut AS (SELECT MAX(ts) - INTERVAL 3 DAY AS c FROM events)
        |SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events e, cut
        |WHERE NOT (e.ts <= cut.c AND e.event_type = 'click')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val cut = ev.agg((max(col("ts")) - expr("INTERVAL 3 DAY")).as("c"))
      Merge.deleteWhere(ev.crossJoin(broadcast(cut)),
          col("ts") <= col("c") && col("event_type") === "click")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    },

    // S10 keyed queue drain (mocexchange.py:574-575 delete per address +
    // scan_moc_user.py:70): remove every event of users who errored, then
    // profile what remains.
    Q(
      "s10b_queue_drain",
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val drained = ev.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      Merge.deleteKeys(ev, drained, Seq("user_id"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_users"))
    },

    // P13-as-MERGE: monotonic upsert — an update wins only when its
    // version is strictly newer than the state's (moc_balances.py:123-136;
    // Delta MERGE condition source.v > target.v). State carries version =
    // event_id + 1000 so roughly half the updates are stale.
    Q(
      "s13_monotonic_upsert",
      s"""$StateCte,
         |tv AS (SELECT user_id, event_id, value, event_id + 1000 AS version FROM t),
         |uv AS (SELECT user_id, event_id, value, event_id AS version FROM u),
         |allv AS (SELECT *, 1 AS pri FROM tv UNION ALL SELECT *, 0 AS pri FROM uv)
         |SELECT user_id, event_id, value, version FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY version DESC, pri DESC) rn
         |  FROM allv) WHERE rn = 1
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val (state0, updates0) = stateAndUpdates(s, d)
      val state = state0.withColumn("version", col("event_id") + 1000)
      val updates = updates0.withColumn("version", col("event_id"))
      Merge.upsertMonotonic(state, updates, Seq("user_id"), "version")
        .orderBy(col("user_id"))
    },

    // T6+S6 end-to-end UserState refresh (moc_balances.py:174-188 enqueue
    // → scan_moc_user.py:44-70 drain): the dirty set is every account
    // touched since the cut; each dirty account's balance is recomputed
    // from FULL history at the head (the reference refetches the whole
    // snapshot per address, not a delta) and upserted over the prior
    // state; untouched accounts keep their stale row. Decimal-pinned sums.
    Q(
      "t6_userstate_refresh",
      """WITH cut AS (SELECT MAX(ts) - INTERVAL 1 DAY AS c FROM events),
        |prior AS (
        |  SELECT e.user_id,
        |    CAST(CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN CAST(e.value AS DECIMAL(18,4))
        |                       ELSE -CAST(e.value AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS balance
        |  FROM events e, cut
        |  WHERE e.ts < cut.c AND e.event_type IN ('purchase','click')
        |  GROUP BY e.user_id),
        |dirty AS (SELECT DISTINCT e.user_id FROM events e, cut WHERE e.ts >= cut.c),
        |recomputed AS (
        |  SELECT e.user_id,
        |    CAST(CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN CAST(e.value AS DECIMAL(18,4))
        |                       ELSE -CAST(e.value AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS balance
        |  FROM events e
        |  WHERE e.event_type IN ('purchase','click')
        |    AND e.user_id IN (SELECT user_id FROM dirty)
        |  GROUP BY e.user_id)
        |SELECT COALESCE(r.user_id, p.user_id) AS user_id,
        |  CASE WHEN r.user_id IS NULL THEN p.balance ELSE r.balance END AS balance,
        |  r.user_id IS NOT NULL AS refreshed
        |FROM prior p FULL JOIN recomputed r ON p.user_id = r.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val cut = ev.agg((max(col("ts")) - expr("INTERVAL 1 DAY")).as("c"))
      val d4 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 4))
      def balance(df: DataFrame): DataFrame = df
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", d4(col("value")))
            .otherwise(-d4(col("value"))))
          .cast(DecimalType(38, 4)).cast(DoubleType).as("balance"))
      val withCut = ev.crossJoin(broadcast(cut))
      val prior = balance(withCut.filter(col("ts") < col("c")))
        .withColumn("refreshed", lit(false))
      val dirty = withCut.filter(col("ts") >= col("c"))
        .select(col("user_id")).distinct()
      val recomputed = balance(ev.join(dirty, Seq("user_id"), "left_semi"))
        .withColumn("refreshed", lit(true))
      Merge.upsert(prior, recomputed, Seq("user_id")).orderBy(col("user_id"))
    },

    // S12 checkpoint advance (scan_raw_txs.py:132-137): the cursor write
    // after one catch-up pass — previous cursor (head strictly before the
    // cut) vs new head.
    Q(
      "s12_checkpoint_advance",
      """WITH cut AS (SELECT MAX(ts) - INTERVAL 2 DAY AS c FROM events),
        |prev AS (SELECT MAX(e.event_id) AS last_block FROM events e, cut WHERE e.ts < cut.c),
        |head AS (SELECT MAX(event_id) AS h FROM events)
        |SELECT prev.last_block, head.h AS new_last_block,
        |       head.h - prev.last_block AS advanced
        |FROM prev, head""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val cut = ev.agg((max(col("ts")) - expr("INTERVAL 2 DAY")).as("c"))
      val prev = ev.crossJoin(broadcast(cut)).filter(col("ts") < col("c"))
        .agg(max(col("event_id")).as("last_block"))
      val head = ev.agg(max(col("event_id")).as("h"))
      prev.crossJoin(head)
        .select(col("last_block"), col("h").as("new_last_block"),
          (col("h") - col("last_block")).as("advanced"))
    }
  )
}
