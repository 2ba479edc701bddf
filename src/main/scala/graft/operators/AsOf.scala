package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.{Q, Tables => T}

/** As-of (backward) joins and their derivatives — SURVEY.md §2.3 J3-J7.
  *
  * Spark 4 SQL has no native as-of join; the reference does them as
  * `find_one(sort=[(blockHeight,-1)])` point lookups (scan_moc_state.py:75-81,
  * bp_prices.py:22-61). At scale the idiomatic Spark shape is NOT a range
  * join (quadratic blow-up) but a single-shuffle merge sweep: union both
  * sides, one window partitioned by key ordered by (ts, tiebreak), and a
  * `last(value, ignoreNulls)` carrying the most recent right-side value
  * forward. One shuffle on the key, linear work, AQE-friendly.
  */
object AsOf {

  /** Backward as-of: for every `left` row, the value of the latest `right`
    * row with the same `key` and `right.ts <= left.ts` (`inclusive=true`,
    * the common as-of-join contract) or `right.ts < left.ts`
    * (`inclusive=false`: ALL right rows tying on ts are out of frame;
    * `tiebreak` only orders rows sharing the same (ts, side)). Result =
    * all of `left`'s columns plus `asofName`.
    *
    * Shape (scale rationale in the object scaladoc): union only
    * (key, ts, tiebreak, __side, __rv) from the right side and null-pad the
    * left payload via unionByName(allowMissingColumns), then one window
    * partitioned by key. `__side` participates in the window ordering so a
    * right row sharing (ts, tiebreak) with a left row is deterministically
    * inside (inclusive) or outside (exclusive) the frame. One shuffle on
    * `key`, linear work per partition.
    */
  def asOfBackward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      rightVal: String, asofName: String,
      inclusive: Boolean = true): DataFrame = {
    require(!left.columns.contains(asofName), s"left already has column $asofName")
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(
      col(key), col(ts), col(tiebreak),
      lit(0).as("__side"), col(rightVal).as("__rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // inclusive: right rows sort before left rows on (ts, tiebreak) ties and
    // the frame ends at the previous row, so a tying right row is included;
    // exclusive: right rows sort after, so it is not.
    val sideOrder = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(col(key)).orderBy(col(ts), sideOrder, col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn(asofName, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }

  /** The same inclusive as-of join as a FIRST-CLASS logical operator:
    * constructs graft.plans.AsOfJoinPlan, which the optimizer rule
    * injected by GraftExtensions expands into the merge-sweep plan. The
    * session must carry `spark.sql.extensions=graft.plans.GraftExtensions`
    * (all engine entry points do). */
  def asOfBackwardPlan(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      rightVal: String, asofName: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        key, ts, tiebreak, rightVal, asofName))
  }

  val queries: Seq[Q] = Seq(

    // J3 per-key backward as-of (scan_moc_state.py:75-81 latest price before
    // cut, generalized per key): for each purchase, the latest strictly
    // preceding view's value for the same user. Merge-sweep implementation —
    // one shuffle on user_id, no range join.
    Q(
      "j3_asof_backward",
      """SELECT event_id, user_id, ts, value, last_view_value FROM (
        |  SELECT event_id, user_id, ts, value, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_value
        |  FROM events WHERE event_type IN ('purchase','view'))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_view_value",
          last(when(col("event_type") === "view", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("last_view_value"))
        .orderBy(col("event_id"))
    }.copy(bench = true),

    // J3d FORWARD as-of — the time-mirror of J3 (next quote at-or-after the
    // trade, the fill-side lookup a matching engine asks): first view value
    // at or after each purchase, same merge-sweep shape (one user_id
    // shuffle, a CURRENT ROW → UNBOUNDED FOLLOWING frame instead of a range
    // join). Completes the as-of family: backward (J3), forward (this),
    // historical (J5), conditional (J6).
    Q(
      "j3d_asof_forward",
      """SELECT event_id, user_id, ts, value, next_view_value FROM (
        |  SELECT event_id, user_id, ts, value, event_type,
        |    FIRST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_view_value
        |  FROM events WHERE event_type IN ('purchase','view'))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_view_value",
          first(when(col("event_type") === "view", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("next_view_value"))
        .orderBy(col("event_id"))
    },

    // J12 NEAREST-direction as-of: each purchase matches the view with the
    // minimal |Δts| in EITHER direction (ties break backward — the earlier
    // view), completing the backward/forward family with the variant
    // sensor-fusion and price-alignment pipelines actually want when skew
    // between feeds can run either way. One partition sort feeds BOTH
    // window frames (Spark shares the sort across same-spec windows), so
    // the cost is the j3d shape, not two passes; the distance compare is
    // integer epoch-µs arithmetic — exact on both engines.
    Q(
      "j12_asof_nearest",
      """SELECT event_id, user_id, ts, value,
        |  CASE WHEN pv_ts IS NULL AND nv_ts IS NULL THEN NULL
        |       WHEN nv_ts IS NULL THEN pv
        |       WHEN pv_ts IS NULL THEN nv
        |       WHEN epoch_us(ts) - epoch_us(pv_ts) <= epoch_us(nv_ts) - epoch_us(ts) THEN pv
        |       ELSE nv END AS nearest_view_value,
        |  CASE WHEN pv_ts IS NULL AND nv_ts IS NULL THEN NULL
        |       WHEN nv_ts IS NULL THEN 'back'
        |       WHEN pv_ts IS NULL THEN 'fwd'
        |       WHEN epoch_us(ts) - epoch_us(pv_ts) <= epoch_us(nv_ts) - epoch_us(ts) THEN 'back'
        |       ELSE 'fwd' END AS direction
        |FROM (
        |  SELECT event_id, user_id, ts, value, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER wb AS pv,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |      OVER wb AS pv_ts,
        |    FIRST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER wf AS nv,
        |    FIRST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |      OVER wf AS nv_ts
        |  FROM events WHERE event_type IN ('purchase','view')
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("event_type"))
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val isView = col("event_type") === "view"
      val withBoth = ev
        .withColumn("pv", last(when(isView, col("value")), ignoreNulls = true).over(wb))
        .withColumn("pv_ts", last(when(isView, col("ts")), ignoreNulls = true).over(wb))
        .withColumn("nv", first(when(isView, col("value")), ignoreNulls = true).over(wf))
        .withColumn("nv_ts", first(when(isView, col("ts")), ignoreNulls = true).over(wf))
        .filter(col("event_type") === "purchase")
      val backWins = unix_micros(col("ts")) - unix_micros(col("pv_ts")) <=
        unix_micros(col("nv_ts")) - unix_micros(col("ts"))
      withBoth
        .withColumn("nearest_view_value",
          when(col("pv_ts").isNull && col("nv_ts").isNull, lit(null))
            .when(col("nv_ts").isNull, col("pv"))
            .when(col("pv_ts").isNull, col("nv"))
            .when(backWins, col("pv")).otherwise(col("nv")))
        .withColumn("direction",
          when(col("pv_ts").isNull && col("nv_ts").isNull, lit(null))
            .when(col("nv_ts").isNull, lit("back"))
            .when(col("pv_ts").isNull, lit("fwd"))
            .when(backWins, lit("back")).otherwise(lit("fwd")))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("nearest_view_value"), col("direction"))
        .orderBy(col("event_id"))
    },

    // J3b generic as-of join via the reusable asOfBackward helper: each
    // purchase picks up the latest view value at-or-before its timestamp
    // for the same user (inclusive as-of — the standard as-of-join
    // contract; j3 above is the reference's strictly-before variant).
    Q(
      "j3b_asof_generic",
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        |  (SELECT v.value FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      asOfBackward(purchases, views, "user_id", "ts", "event_id",
          rightVal = "value", asofName = "asof_view_value")
        .orderBy(col("event_id"))
    },

    // J3c the same as-of join expressed through the CUSTOM LOGICAL
    // OPERATOR (graft.plans.AsOfJoinPlan + the optimizer rewrite injected
    // via SparkSessionExtensions): semantics identical to j3b, but the
    // merge-sweep expansion is chosen by the optimizer rule, not spelled
    // at the call site.
    Q(
      "j3c_asof_plan",
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        |  (SELECT v.value FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      asOfBackwardPlan(purchases, views, "user_id", "ts", "event_id",
          rightVal = "value", asofName = "asof_view_value")
        .orderBy(col("event_id"))
    },

    // J4 price variation (bp_prices.py:22-61): per user, current value
    // (top-1 by time) vs value as of a lookback cut (here: global max ts
    // minus 7 days), delta in doubles (same IEEE expression both engines).
    Q(
      "j4_price_variation",
      """WITH cut AS (SELECT MAX(ts) - INTERVAL 7 DAY AS c FROM events WHERE event_type = 'purchase'),
        |cur AS (
        |  SELECT user_id, value FROM (
        |    SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |prev AS (
        |  SELECT user_id, value FROM (
        |    SELECT e.user_id, e.value, ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) rn
        |    FROM events e, cut WHERE e.event_type = 'purchase' AND e.ts <= cut.c) WHERE rn = 1)
        |SELECT cur.user_id, cur.value AS cur_value, prev.value AS prev_value,
        |       cur.value - prev.value AS delta
        |FROM cur LEFT JOIN prev ON cur.user_id = prev.user_id
        |ORDER BY cur.user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      val cut = ev.agg(max(col("ts")).as("maxTs"))
        .select((col("maxTs") - expr("INTERVAL 7 DAY")).as("c"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val cur = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("value").as("cur_value"))
      val prev = ev.crossJoin(broadcast(cut)).filter(col("ts") <= col("c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("value").as("prev_value"))
      cur.join(prev, Seq("user_id"), "left")
        .withColumn("delta", col("cur_value") - col("prev_value"))
        .orderBy(col("user_id"))
    },

    // J5 historical as-of at a cut (report/historical.py:169-171: state at
    // latest height < now - 15 days): latest event per user older than the
    // cut, one ranked window after a partition-prunable filter.
    Q(
      "j5_asof_historical",
      """SELECT user_id, event_id, ts, value FROM (
        |  SELECT e.user_id, e.event_id, e.ts, e.value,
        |    ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) rn
        |  FROM events e, (SELECT MAX(ts) - INTERVAL 3 DAY AS c FROM events) cut
        |  WHERE e.ts < cut.c) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val cut = ev.agg((max(col("ts")) - expr("INTERVAL 3 DAY")).as("c"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      ev.crossJoin(broadcast(cut)).filter(col("ts") < col("c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .orderBy(col("user_id"))
    },

    // J6 conditional override from a second source (scan_moc_state.py:84-99:
    // settlement price overrides daily price inside the window): per user,
    // take latest purchase value, but if the user's latest signup is newer
    // than their latest purchase, use the signup value and flag it.
    Q(
      "j6_conditional_override",
      """WITH p AS (
        |  SELECT user_id, value, ts FROM (
        |    SELECT user_id, value, ts, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |g AS (
        |  SELECT user_id, value, ts FROM (
        |    SELECT user_id, value, ts, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1)
        |SELECT p.user_id,
        |  CASE WHEN g.ts > p.ts THEN g.value ELSE p.value END AS effective_value,
        |  CASE WHEN g.ts > p.ts THEN FALSE ELSE TRUE END AS is_daily
        |FROM p LEFT JOIN g ON p.user_id = g.user_id
        |ORDER BY p.user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      def top1(t: String) = ev.filter(col("event_type") === t)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("value"), col("ts"))
      val p = top1("purchase")
      val g = top1("signup").withColumnRenamed("value", "g_value").withColumnRenamed("ts", "g_ts")
      p.join(g, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("g_ts") > col("ts"), col("g_value")).otherwise(col("value")).as("effective_value"),
          when(col("g_ts") > col("ts"), lit(false)).otherwise(lit(true)).as("is_daily"))
        .orderBy(col("user_id"))
    },

    // J7 liquidation fan-out (mocsettlement.py:292-368; moc.py:38-91): a
    // rare trigger event fans out across all qualifying account holders —
    // broadcast cross join of the (tiny) trigger set against the filtered
    // dimension, then per-pair projection.
    Q(
      "j7_fanout_cross",
      """WITH trig AS (
        |  SELECT event_id, ts, value FROM events WHERE event_type = 'error'
        |  ORDER BY ts DESC, event_id DESC LIMIT 3)
        |SELECT t.event_id AS trigger_id, c.c_custkey, c.c_acctbal, t.value
        |FROM trig t CROSS JOIN customer c
        |WHERE c.c_acctbal > 9900
        |ORDER BY trigger_id, c_custkey""".stripMargin) { (s, d) =>
      val trig = T.events(s, d).filter(col("event_type") === "error")
        .orderBy(col("ts").desc, col("event_id").desc).limit(3)
        .select(col("event_id").as("trigger_id"), col("value"))
      val cust = T.customer(s, d).filter(col("c_acctbal") > 9900)
        .select(col("c_custkey"), col("c_acctbal"))
      cust.crossJoin(broadcast(trig))
        .select(col("trigger_id"), col("c_custkey"), col("c_acctbal"), col("value"))
        .orderBy(col("trigger_id"), col("c_custkey"))
    },

    // J10 bucketized range join: "which purchases fall inside each alert
    // window" — the declarative BETWEEN formulation executes as a
    // BroadcastNestedLoopJoin (quadratic); bucketizing time into
    // fixed-width chunks turns it into a HASH join on the bucket key plus
    // a residual range filter: intervals explode into the ≤3 buckets they
    // cover, points carry exactly one bucket (so no post-join dedup), and
    // the equi-join prunes all non-overlapping pairs before the BETWEEN
    // runs. The standard interval-join rewrite at 100 TB.
    Q(
      "j10_range_bucketed",
      """WITH iv AS (
        |  SELECT event_id AS interval_id, ts - INTERVAL 30 MINUTES AS lo,
        |         ts + INTERVAL 30 MINUTES AS hi
        |  FROM events WHERE event_type = 'error'
        |  ORDER BY ts DESC, event_id DESC LIMIT 50),
        |p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT iv.interval_id, COUNT(*) AS n
        |FROM iv JOIN p ON p.ts >= iv.lo AND p.ts <= iv.hi
        |GROUP BY iv.interval_id ORDER BY interval_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val iv = ev.filter(col("event_type") === "error")
        .orderBy(col("ts").desc, col("event_id").desc).limit(50)
        .select(col("event_id").as("interval_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("lo"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
      val ivb = iv.withColumn("bucket",
        explode(sequence(expr("unix_timestamp(lo) div 1800"),
          expr("unix_timestamp(hi) div 1800"))))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("ts"), expr("unix_timestamp(ts) div 1800").as("bucket"))
      p.join(broadcast(ivb), Seq("bucket"))
        .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
        .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("interval_id"))
    },

    // A11 time-grid resample + forward fill — "the price at every hour on
    // the hour", the gap-filling resample every reporting layer needs over
    // an irregular event stream. Spark-first shape: the grid rows UNION
    // into the event stream and ONE per-user window pass forward-fills
    // (last value ignoreNulls up to current row) — the same union-window
    // rewrite as the as-of family, so there is no grid⨝events range join
    // at all; at 100 TB the cost is one user-keyed sort of events + grid
    // (grid cardinality = users × 168, a constant per user). Tie order
    // (ts, is_ev DESC) puts an event AT the grid instant before the grid
    // row, so an exactly-on-the-hour tick is included — and the tie is
    // never decided by the (null on grid rows) event_id, keeping the two
    // engines' null-ordering difference unobservable.
    Q(
      "a11_resample",
      """WITH grid AS (
        |  SELECT u.user_id, g.gts FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |      TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS gts) g),
        |src AS (
        |  SELECT user_id, ts, value, event_id, 1 AS is_ev FROM events
        |  WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, gts AS ts, NULL AS value, NULL AS event_id, 0 AS is_ev
        |  FROM grid),
        |f AS (
        |  SELECT user_id, ts, is_ev,
        |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, is_ev DESC, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |  FROM src)
        |SELECT user_id, ts AS grid_ts, v AS value FROM f WHERE is_ev = 0
        |ORDER BY user_id, grid_ts""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val grid = ev.select(col("user_id")).distinct()
        .withColumn("ts", explode(expr(
          "sequence(timestamp '2024-01-01 00:00:00', timestamp '2024-01-07 23:00:00', interval 1 hour)")))
        .select(col("user_id"), col("ts"),
          lit(null).cast(DoubleType).as("value"),
          lit(null).cast("bigint").as("event_id"), lit(0).as("is_ev"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"),
          lit(1).as("is_ev"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_ev").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(grid)
        .withColumn("v", last(col("value"), ignoreNulls = true).over(w))
        .filter(col("is_ev") === 0)
        .select(col("user_id"), col("ts").as("grid_ts"), col("v").as("value"))
        .orderBy(col("user_id"), col("grid_ts"))
    },

    // J11 interval⨝interval overlap join — the case J10's broadcast trick
    // cannot cover: BOTH sides are full streams (price-validity intervals
    // per user × alert windows), so neither fits in a broadcast and the
    // declarative overlap predicate would be a cartesian per user. Shared
    // fixed-width bucketing makes it a hash join on (user_id, bucket):
    // validity intervals are staleness-capped at 6 h (the p13 bound) so
    // each explodes into ≤7 one-hour buckets, alert windows into ≤2, and a
    // pair overlapping several shared buckets is collapsed by the final
    // distinct — at 100 TB the shuffle carries rows·≤7 instead of pairs².
    // All arithmetic in epoch-microsecond longs: the overlap length is
    // integer-exact on both engines.
    Q(
      "j11_interval_overlap",
      """WITH v AS (
        |  SELECT user_id, event_id AS view_event_id, epoch_us(ts) AS vs,
        |    least(coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |                   9223372036854775807), epoch_us(ts) + 21600000000) AS ve
        |  FROM events WHERE event_type = 'view'),
        |e AS (SELECT user_id, event_id AS err_event_id,
        |    epoch_us(ts) - 600000000 AS es, epoch_us(ts) + 600000000 AS ee
        |  FROM events WHERE event_type = 'error')
        |SELECT v.user_id, view_event_id, err_event_id,
        |  least(ve, ee) - greatest(vs, es) AS overlap_us
        |FROM v JOIN e ON v.user_id = e.user_id AND vs < ee AND es < ve
        |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val hourUs = 3600000000L
      val ev = T.events(s, d)
      // vs/view_event_id order ≡ the oracle's (ts, event_id): epoch_us is
      // strictly monotone in ts
      val wv = Window.partitionBy(col("user_id"))
        .orderBy(col("vs"), col("view_event_id"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          unix_micros(col("ts")).as("vs"))
        .withColumn("ve", least(
          coalesce(lead(col("vs"), 1).over(wv), lit(Long.MaxValue)),
          col("vs") + lit(21600000000L)))
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_event_id"),
          (unix_micros(col("ts")) - 600000000L).as("es"),
          (unix_micros(col("ts")) + 600000000L).as("ee"))
      val vb = v.withColumn("bucket",
        explode(sequence(expr(s"vs div $hourUs"), expr(s"(ve - 1) div $hourUs"))))
      val eb = e.withColumn("bucket",
        explode(sequence(expr(s"es div $hourUs"), expr(s"(ee - 1) div $hourUs"))))
      vb.join(eb, Seq("user_id", "bucket"))
        .filter(col("vs") < col("ee") && col("es") < col("ve"))
        .select(col("user_id"), col("view_event_id"), col("err_event_id"),
          (least(col("ve"), col("ee")) - greatest(col("vs"), col("es"))).as("overlap_us"))
        .distinct()
        .orderBy(col("user_id"), col("view_event_id"), col("err_event_id"))
    },

    // J7b point-in-time balance snapshot (SURVEY.md §7.4 hard part 3 —
    // mocsettlement.py:292-368 queries the chain at block-1; a batch engine
    // answers "balance of every user just before the trigger" from the
    // event log itself): signed deltas aggregated up to the liquidation
    // trigger's timestamp, positive holders fanned out one row per user.
    // Decimal-pinned sums keep the doubles order-independent.
    Q(
      "j7b_balance_snapshot",
      """WITH trig AS (SELECT event_id, ts FROM events WHERE event_type = 'error'
        |             ORDER BY ts DESC, event_id DESC LIMIT 1),
        |bal AS (
        |  SELECT e.user_id,
        |    CAST(CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN CAST(e.value AS DECIMAL(18,4))
        |                       ELSE -CAST(e.value AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS balance
        |  FROM events e, trig
        |  WHERE e.ts < trig.ts AND e.event_type IN ('purchase','click')
        |  GROUP BY e.user_id)
        |SELECT trig.event_id AS trigger_id, b.user_id, b.balance
        |FROM bal b, trig WHERE b.balance > 0
        |ORDER BY b.user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val trig = ev.filter(col("event_type") === "error")
        .orderBy(col("ts").desc, col("event_id").desc).limit(1)
        .select(col("event_id").as("trigger_id"), col("ts").as("trig_ts"))
      val d4 = (c: Column) => c.cast(DecimalType(18, 4))
      ev.filter(col("event_type").isin("purchase", "click"))
        .crossJoin(broadcast(trig))
        .filter(col("ts") < col("trig_ts"))
        .groupBy(col("trigger_id"), col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", d4(col("value")))
            .otherwise(-d4(col("value"))))
          .cast(DecimalType(38, 4)).cast(DoubleType).as("balance"))
        .filter(col("balance") > 0)
        .select(col("trigger_id"), col("user_id"), col("balance"))
        .orderBy(col("user_id"))
    },

    // P13 staleness guard (moc_balances.py:123-136 skip-if-newer): keep a
    // row only if no strictly newer row exists for the same key — an
    // anti-join with an inequality condition (small keyspace slice).
    Q(
      "p13_staleness_guard",
      """SELECT e.user_id, e.event_id, e.ts FROM events e
        |WHERE e.user_id <= 20 AND NOT EXISTS (
        |  SELECT 1 FROM events n WHERE n.user_id = e.user_id
        |    AND (n.ts > e.ts OR (n.ts = e.ts AND n.event_id > e.event_id)))
        |ORDER BY e.user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).filter(col("user_id") <= 20)
        .select(col("user_id"), col("event_id"), col("ts"))
      val newer = ev.select(col("user_id").as("n_user"), col("event_id").as("n_id"), col("ts").as("n_ts"))
      ev.join(newer,
          col("user_id") === col("n_user") &&
            (col("n_ts") > col("ts") || (col("n_ts") === col("ts") && col("n_id") > col("event_id"))),
          "left_anti")
        .orderBy(col("user_id"))
    }
  )
}
