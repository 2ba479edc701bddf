package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

/** Report-analytics extensions over the reference's reporting surface
  * (report/historical.py, report/bp_prices.py patterns widened to the
  * standard warehouse-report trio): OHLC price bars, cohort retention, and
  * robust (median/MAD) outlier detection.
  *
  * Determinism conventions follow Relational.scala: money moves through
  * integer cents (`round(value*100)` is tie-free because the generator
  * writes 2-decimal values), every window order carries the unique
  * `event_id` tie-break, and interpolated medians stay exact because the
  * inputs are integers / half-integers < 2^52 (the (a+b)/2 interpolation is
  * then a single exact FP operation on both engines).
  */
object Reports {

  /** the OHLC candle program, shared by the `a8_ohlc` registered query and
    * the ApiServer's /prices/ohlc route (same single-day-shuffle shape). */
  def ohlcBars(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val pe = T.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("day", col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"),
        round(col("value") * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pe.withColumn("o", first(col("value")).over(w))
      .withColumn("c", last(col("value")).over(w))
      .groupBy(col("day"))
      .agg(min(col("o")).as("open"), max(col("value")).as("high"),
        min(col("value")).as("low"), min(col("c")).as("close"),
        count(lit(1)).as("volume"),
        (sum(col("cents")) / (lit(100.0) * count(lit(1)))).as("vwap"))
  }

  val queries: Seq[Q] = Seq(

    // ── OHLC bars ──────────────────────────────────────────────────────────
    // The reference reports price variation over a stream of price events
    // (report/bp_prices.py:22-61 keeps current-vs-earlier price per window);
    // the standard exchange-facing extension is the OHLC candle: per day,
    // open/high/low/close/volume/VWAP of the 'purchase' (price-carrying)
    // events. Scale shape: ONE shuffle on the day key — the window pass and
    // the aggregation share the hash-partition-by-day exchange, partial
    // min/max/count combine map-side, and no per-key state exceeds a handful
    // of scalars. VWAP divides two exact integers (Σcents, 100·n) so the
    // double result is one correctly-rounded op on both engines.
    Q(
      "a8_ohlc",
      """WITH pe AS (
        |  SELECT date_trunc('day', ts) AS day, ts, event_id, value,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT day, value, cents,
        |    first_value(value) OVER (PARTITION BY day ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(value)  OVER (PARTITION BY day ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM pe
        |)
        |SELECT day, min(o) AS open, max(value) AS high, min(value) AS low,
        |  min(c) AS close, count(*) AS volume,
        |  CAST(sum(cents) AS BIGINT) / (100.0 * count(*)) AS vwap
        |FROM w GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      ohlcBars(s, d).orderBy(col("day"))
    },

    // ── Cohort retention ───────────────────────────────────────────────────
    // First-order-month cohorts × active-month offsets over `orders` — the
    // report the reference's per-user activity queries (report/
    // historical.py:144-165 group-by-user counts) roll up to. Scale shape:
    // ONE wide shuffle keyed on o_custkey (groupBy with map-side-combined
    // min + collect_set of ≤80 month values — bounded by the date range,
    // not the row count), then the explode and the cohort-level
    // count-distinct, whose key space is |months|² — tiny. No join against
    // a second full-table scan: the cohort month rides along in the same
    // aggregation pass.
    Q(
      "a9_cohort_retention",
      """WITH fo AS (SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort_m
        |  FROM orders GROUP BY 1),
        |act AS (SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS act_m
        |  FROM orders)
        |SELECT f.cohort_m,
        |  CAST((year(a.act_m) - year(f.cohort_m)) * 12
        |     + (month(a.act_m) - month(f.cohort_m)) AS BIGINT) AS month_offset,
        |  count(DISTINCT a.o_custkey) AS n_custs
        |FROM fo f JOIN act a USING(o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val om = T.orders(s, d)
        .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
      om.groupBy(col("o_custkey"))
        .agg(min(col("m")).as("cohort_m"), collect_set(col("m")).as("ms"))
        .select(col("o_custkey"), col("cohort_m"), explode(col("ms")).as("act_m"))
        .groupBy(col("cohort_m"),
          ((year(col("act_m")) - year(col("cohort_m"))) * 12
            + (month(col("act_m")) - month(col("cohort_m"))))
            .cast(LongType).as("month_offset"))
        // rows are unique per (custkey, act_m) after collect_set+explode, so
        // a plain count IS the distinct-user count — no Expand, one shuffle
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("cohort_m"), col("month_offset"))
    },

    // ── Ordered funnel conversion ──────────────────────────────────────────
    // signup → view → purchase, each stage within 7 days of the previous
    // stage's FIRST occurrence — the ordered-sequence funnel (stage N+1
    // must follow stage N in time, not merely co-occur). Spark shape: three
    // chained user_id-keyed min-aggregations, each stage's output joined
    // back on the SAME key — one hash partitioning carries all three hops
    // (no re-shuffle between stages at scale), and each stage's frame
    // shrinks monotonically (users who converted so far). Counts come off
    // the three frames as 1-row aggregates unioned into the report.
    Q(
      "a10_funnel",
      """WITH s1 AS (SELECT user_id, min(ts) AS s1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |v1 AS (SELECT e.user_id, min(e.ts) AS v1 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts >= s1.s1
        |    AND e.ts <= s1.s1 + INTERVAL 7 DAY GROUP BY 1),
        |p1 AS (SELECT e.user_id, min(e.ts) AS p1 FROM events e
        |  JOIN v1 ON e.user_id = v1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v1.v1
        |    AND e.ts <= v1.v1 + INTERVAL 7 DAY GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'signup' AS name, (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'view_within_7d', (SELECT count(*) FROM v1)
        |  UNION ALL SELECT 3, 'purchase_within_7d', (SELECT count(*) FROM p1))
        |ORDER BY stage""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val week = expr("INTERVAL 7 DAYS")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s1"))
      val v1 = ev.filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("s1") && col("ts") <= col("s1") + week)
        .groupBy(col("user_id")).agg(min(col("ts")).as("v1"))
      val p1 = ev.filter(col("event_type") === "purchase")
        .join(v1, Seq("user_id"))
        .filter(col("ts") >= col("v1") && col("ts") <= col("v1") + week)
        .groupBy(col("user_id")).agg(min(col("ts")).as("p1"))
      def stageRow(n: Int, name: String, frame: org.apache.spark.sql.DataFrame) =
        frame.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("stage"), lit(name).as("name"), col("n_users"))
      stageRow(1, "signup", s1)
        .unionAll(stageRow(2, "view_within_7d", v1))
        .unionAll(stageRow(3, "purchase_within_7d", p1))
        .orderBy(col("stage"))
    },

    // ── CUSUM changepoint trace ────────────────────────────────────────────
    // Drift detection over the daily purchase volume: the cumulative sum
    // of deviations from the global mean, kept INTEGER-EXACT by scaling —
    // cusum_scaled(k) = (Σ₁ᵏ n) · n_days − k · Σ n, which is n_days ×
    // the classical CUSUM and never divides. A level shift in the rate
    // shows as a slope break; the monitoring side reads the extremum as
    // the change candidate. The running sum's window is over DAILY rows —
    // bounded by the calendar, not the event count, so the single-
    // partition window is a ≤O(days) frame at any scale (the per-event
    // work is the one groupBy(day) map-side-combined shuffle).
    Q(
      "a14_cusum_trace",
      """WITH daily AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS nd FROM daily),
        |c AS (SELECT day, n,
        |    sum(n) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY day) AS k
        |  FROM daily)
        |SELECT c.day, c.n,
        |  CAST(c.cum * m.nd - c.k * m.tot AS BIGINT) AS cusum_scaled
        |FROM c, m ORDER BY c.day""".stripMargin) { (s, d) =>
      val daily = T.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val m = daily.agg(sum(col("n")).as("tot"), count(lit(1)).as("nd"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("k", row_number().over(w))
        .crossJoin(broadcast(m))
        .select(col("day"), col("n"),
          (col("cum") * col("nd") - col("k") * col("tot")).as("cusum_scaled"))
        .orderBy(col("day"))
    },

    // ── Exact-moment variance stats ────────────────────────────────────────
    // Per-type n/mean/variance/stddev where BOTH engines agree bitwise: a
    // double stddev_pop is order-dependent in the last ulp (Welford vs
    // two-pass vs naive moments accumulate differently), so neither engine's
    // built-in is oracle-safe. Instead the integer moments Σx, Σx² accumulate
    // EXACTLY in 128-bit decimal (associative, any partition order), and the
    // closed forms mean = Σx/(100n), var = (nΣx² − (Σx)²)/(10⁴n²) perform a
    // fixed number of correctly-rounded FP ops on exact operands — the same
    // bits on every engine, every partitioning, every scale. The shape is
    // one map-side-combined groupBy; nothing else.
    Q(
      "a12_moment_stats",
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT)) AS s1,
        |    sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT)
        |      * CAST(round(value*100) AS BIGINT)) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(s1 AS DOUBLE) / (100.0 * n) AS mean,
        |  CAST(n * s2 - s1 * s1 AS DOUBLE) / (10000.0 * n * n) AS variance,
        |  sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (10000.0 * n * n)) AS stddev
        |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val cents = round(col("value") * 100).cast(LongType)
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val m = T.events(s, d)
        .select(col("event_type"), cents.as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("c"))).as("s1"),
          sum(dec(col("c")) * dec(col("c"))).as("s2"))
      val varCol = (dec(col("n")) * col("s2") - col("s1") * col("s1")).cast(DoubleType) /
        (lit(10000.0) * col("n") * col("n"))
      m.select(col("event_type"), col("n"),
          (col("s1").cast(DoubleType) / (lit(100.0) * col("n"))).as("mean"),
          varCol.as("variance"), sqrt(varCol).as("stddev"))
        .orderBy(col("event_type"))
    },

    // ── Exponentially time-decayed engagement counters ─────────────────────
    // The feature-store primitive: per-user activity counters where an
    // event's contribution halves per half-life elapsed (1-day and 7-day
    // half-lives side by side). EXACT on both engines: the weight is the
    // integer 2^(20 − age/halflife) (a shift, zero past 20 half-lives — at
    // 2^-20 ≈ 1e-6 the contribution is below any feature's precision
    // anyway), so the decayed counter is a sum of exact integers scaled by
    // 2^20 — no float pow, no summation-order sensitivity. Plan: narrow map
    // (date arithmetic + shift) → ONE partial-agged groupBy(user_id) →
    // TakeOrdered; the max-day anchor is a 1-row broadcast. At 100 TB this
    // is the same shape as a1_group_count — the decay adds zero shuffles.
    Q(
      "a16_decay",
      """WITH mx AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS maxd FROM events),
        |e AS (SELECT user_id,
        |    date_diff('day', CAST(date_trunc('day', ts) AS DATE), mx.maxd) AS age
        |  FROM events, mx),
        |w AS (SELECT user_id,
        |    CASE WHEN age <= 20 THEN (CAST(1 AS BIGINT) << CAST(20 - age AS INTEGER))
        |         ELSE CAST(0 AS BIGINT) END AS w1,
        |    CASE WHEN age // 7 <= 20 THEN (CAST(1 AS BIGINT) << CAST(20 - age // 7 AS INTEGER))
        |         ELSE CAST(0 AS BIGINT) END AS w7
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(w1) AS BIGINT) AS decay1_scaled,
        |  CAST(sum(w7) AS BIGINT) AS decay7_scaled
        |FROM w GROUP BY user_id
        |ORDER BY decay7_scaled DESC, user_id LIMIT 25""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).cast(DateType).as("day"))
      val mx = ev.agg(max(col("day")).as("maxd"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age", datediff(col("maxd"), col("day")).cast(LongType))
        .withColumn("w1", expr(
          "CASE WHEN age <= 20 THEN shiftleft(CAST(1 AS BIGINT), CAST(20 - age AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .withColumn("w7", expr(
          "CASE WHEN age div 7 <= 20 THEN shiftleft(CAST(1 AS BIGINT), CAST(20 - age div 7 AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("w1")).as("decay1_scaled"), sum(col("w7")).as("decay7_scaled"))
        .orderBy(col("decay7_scaled").desc, col("user_id"))
        .limit(25)
    },

    // ── Robust outliers (median/MAD) ───────────────────────────────────────
    // Modified-z-score outlier flagging per event_type: |cents − median| >
    // 3.5·MAD, the robust alternative to mean/stddev that the monitoring
    // side of an indexer wants (a single flash-crash price cannot drag the
    // threshold the way it drags a stddev). EXACT medians: integer cents →
    // median is an int or half-int, |dev| is a half-int, MAD a quarter-int —
    // every interpolation is exact FP on both engines, so the filter
    // boundary is bit-identical. Scale note: exact percentile keeps
    // per-group distinct-value state; that is bounded here (cents ≤ 50k
    // distinct) and right for a monitoring report — for unbounded-cardinality
    // columns the engine's quantile-sketch operator (gr_quantile_sketch) is
    // the scale path. Two passes over events, both ending in a ≤5-row
    // broadcast — nothing driver-side.
    Q(
      "a7_anomaly_mad",
      """WITH pc AS (SELECT event_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |med AS (SELECT event_type, median(cents) AS med FROM pc GROUP BY 1),
        |dev AS (SELECT p.event_id, p.event_type, p.cents,
        |    abs(p.cents - m.med) AS adev FROM pc p JOIN med m USING(event_type)),
        |mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
        |SELECT d.event_type, d.event_id, d.cents, d.adev, m2.mad
        |FROM dev d JOIN mad m2 USING(event_type)
        |WHERE d.adev > 3.5 * m2.mad
        |ORDER BY d.event_type, d.event_id""".stripMargin) { (s, d) =>
      val pc = T.events(s, d).select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      val med = pc.groupBy(col("event_type"))
        .agg(percentile(col("cents"), lit(0.5)).as("med"))
      val dev = pc.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .filter(col("adev") > lit(3.5) * col("mad"))
        .select(col("event_type"), col("event_id"), col("cents"), col("adev"),
          col("mad"))
        .orderBy(col("event_type"), col("event_id"))
    }
  )
}
