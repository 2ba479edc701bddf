package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

/** Relational operator coverage for SURVEY.md §2.2–§2.7 expressed over the
  * driver testdata (TESTDATA.md), one registered query per operator row.
  *
  * Determinism conventions (oracle = DuckDB hash compare):
  *  - double aggregation goes through DecimalType so results are exact and
  *    identical regardless of partition/accumulation order (a double SUM is
  *    order-dependent in the last ulp; Decimal is not);
  *  - every query output carries a total order via unique tie-breaker keys;
  *  - final aggregate columns are re-cast DECIMAL → DOUBLE. The decimal value
  *    is exact and identical on both engines; converting to double is then a
  *    single deterministic rounding, PROVIDED the scaled unscaled-integer
  *    stays < 2^53 (we keep final scale at 4, money values have ≤4 real
  *    decimal digits, magnitudes ≤ 1e9 even at sf0.1 → ≤ 1e13 ≪ 2^53).
  *    This sidesteps both double-sum order-dependence and engine-specific
  *    decimal string/dtype rendering.
  */
object Relational {

  /** exact operand: double → DECIMAL(18,4) (no ties at scale 4 from binary
    * doubles, so HALF_UP-vs-HALF_EVEN rounding differences are unobservable) */
  private def d6(c: Column): Column = c.cast(DecimalType(18, 4))
  /** pinned output: exact decimal → ≤2^53-unscaled decimal → double */
  private def o6(c: Column): Column = c.cast(DecimalType(38, 4)).cast(DoubleType)
  /** product of two scale-4 operands carries ≤4 real digits too (2dp × 2dp);
    * scale 4 keeps the unscaled integer ≪ 2^53 at bench scale */
  private def o12(c: Column): Column = o6(c)

  val queries: Seq[Q] = Seq(

    // ── A: aggregations ────────────────────────────────────────────────────

    // Flagship (§7.2 analog on testdata): pricing-summary aggregation.
    // Reference: report/historical.py:144-165 group-count pattern widened to
    // the full agg surface (sum/avg/count) for bench purposes.
    Q(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          o6(sum(d6(col("l_quantity")))).as("sum_qty"),
          o6(sum(d6(col("l_extendedprice")))).as("sum_base_price"),
          o12(sum(d6(col("l_extendedprice")) * (lit(1) - d6(col("l_discount"))))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }.copy(bench = true),

    // Q3-shape shipping-priority composite: segment-filtered 3-way join
    // (broadcast dim → fact) + grouped revenue + top-10 — the
    // multi-join/agg plan the report side would run at 100 TB (join order
    // and broadcast choice left to Catalyst/AQE; revenue Decimal-pinned,
    // deterministic tie-break).
    Q(
      "q3_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15 00:00:00").cast(TimestampType))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = T.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15 00:00:00").cast(TimestampType))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(o12(sum(d6(col("l_extendedprice")) * (lit(1) - d6(col("l_discount"))))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }.copy(bench = true),

    // Q5-shape local-supplier revenue: snowflake join (two broadcast dims)
    // + fact-fact equi-join with a co-nationality predicate + grouped
    // revenue per nation.
    Q(
      "q5_local_supplier",
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val asia = broadcast(T.nation(s, d)
        .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val ord = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val li = T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val supp = T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(asia, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(o12(sum(d6(col("l_extendedprice")) * (lit(1) - d6(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }.copy(bench = true),

    // A1 group-count by key (historical.py:144-165): count per address →
    // count per user, plus the "distinct actives" via a1b below.
    Q(
      "a1_group_count",
      """SELECT user_id, COUNT(*) AS n
        |FROM events
        |WHERE event_type IN ('purchase','signup','error')
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_type").isin("purchase", "signup", "error"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // A1b distinct active users (countDistinct; historical.py:165).
    Q(
      "a1_distinct_users",
      """SELECT COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE event_type IN ('purchase','signup','error')""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_type").isin("purchase", "signup", "error"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },

    // A1-at-scale: approximate distinct actives via the DETERMINISTIC
    // HyperLogLog (same machinery as a13_hll_sketch, ScaleOps) — mergeable
    // 64-register sketches instead of shuffling the full key set, and,
    // unlike Spark's built-in HLL++ (whose sketch internals are not
    // reproducible in SQL), every step is exact cross-engine: md5-derived
    // 60-bit hash, integer register index/rank (rank = a bit LENGTH, no
    // log2), 128-bit-exact harmonic-sum accumulation, then one fixed chain
    // of correctly-rounded double ops. Raw-range estimator only (n ≫ 2.5m
    // here). The exact count rides beside the estimate so the error is
    // visible in the row itself. Scale shape: one ≤64-key shuffle.
    Q(
      "a1b_approx_distinct",
      """WITH f AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type IN ('purchase','signup','error')),
        |h AS (
        |  SELECT CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h60
        |  FROM f),
        |r AS (
        |  SELECT h60 % 64 AS j,
        |    CASE WHEN h60 // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h60 // 64)) END AS rho
        |  FROM h),
        |m AS (SELECT j, max(rho) AS mj FROM r GROUP BY 1),
        |s AS (SELECT
        |    sum(CAST(CAST(1 AS BIGINT) << CAST(62 - mj AS INT) AS HUGEINT))
        |      + (64 - count(*)) * CAST(4611686018427387904 AS HUGEINT) AS s4
        |  FROM m),
        |x AS (SELECT count(*) AS n_users_exact FROM f)
        |SELECT x.n_users_exact,
        |  (CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)
        |    / CAST(s4 AS DOUBLE) AS n_users_approx
        |FROM s, x""".stripMargin) { (s, d) =>
      val f = T.events(s, d)
        .filter(col("event_type").isin("purchase", "signup", "error"))
        .select(col("user_id")).distinct()
      val h = f.select(
        conv(substring(md5(col("user_id").cast(StringType)), 1, 15), 16, 10)
          .cast(LongType).as("h60"))
      val r = h.select(expr("h60 % 64").as("j"),
        when(expr("h60 div 64") === 0, 55)
          .otherwise(lit(55) - length(bin(expr("h60 div 64")))).as("rho"))
      val m = r.groupBy(col("j")).agg(max(col("rho")).as("mj"))
      val s4 = m.agg(
        (sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(62 - mj AS INT)) AS DECIMAL(38,0))"))
          + (lit(64) - count(lit(1))).cast(DecimalType(38, 0))
            * lit(4611686018427387904L).cast(DecimalType(38, 0))).as("s4"))
      val exact = f.agg(count(lit(1)).as("n_users_exact"))
      s4.crossJoin(exact)
        .select(col("n_users_exact"),
          expr("(CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)" +
            " / CAST(s4 AS DOUBLE)").as("n_users_approx"))
    },

    // A1-at-scale, part 2 — sketch MERGEABILITY, the property that makes a
    // distinct-count sketch a cross-partition / cross-day combine at 100 TB:
    // two INDEPENDENT 64-register HLLs (one per event type, built without
    // seeing each other's input) merged by register-wise MAX estimate the
    // UNION's cardinality, while the plain SUM of the two per-sketch
    // estimates over-counts the overlap — both facts visible in the one
    // output row beside the exact union count. Same deterministic
    // construction as `a1b_approx_distinct` (md5-derived 60-bit hash,
    // bit-LENGTH rank, 128-bit-exact harmonic sum, one fixed chain of
    // correctly-rounded double ops), so the compare is exact cross-engine.
    // Scale shape: each sketch is ≤64 rows; the merge is a ≤128-row
    // shuffle — constant regardless of input size.
    Q(
      "a15_hll_union",
      """WITH f AS (
        |  SELECT DISTINCT event_type AS grp, user_id FROM events
        |  WHERE event_type IN ('purchase','click')),
        |h AS (
        |  SELECT grp, CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h60
        |  FROM f),
        |r AS (
        |  SELECT grp, h60 % 64 AS j,
        |    CASE WHEN h60 // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h60 // 64)) END AS rho
        |  FROM h),
        |pg AS (SELECT grp, j, max(rho) AS mj FROM r GROUP BY 1, 2),
        |mrg AS (SELECT j, max(mj) AS mj FROM pg GROUP BY 1),
        |su AS (SELECT
        |    sum(CAST(CAST(1 AS BIGINT) << CAST(62 - mj AS INT) AS HUGEINT))
        |      + (64 - count(*)) * CAST(4611686018427387904 AS HUGEINT) AS s4
        |  FROM mrg),
        |sg AS (SELECT grp,
        |    sum(CAST(CAST(1 AS BIGINT) << CAST(62 - mj AS INT) AS HUGEINT))
        |      + (64 - count(*)) * CAST(4611686018427387904 AS HUGEINT) AS s4
        |  FROM pg GROUP BY 1),
        |eg AS (SELECT grp,
        |    (CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)
        |      / CAST(s4 AS DOUBLE) AS e FROM sg),
        |x AS (SELECT count(DISTINCT user_id) AS n_union_exact FROM f)
        |SELECT x.n_union_exact,
        |  (CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)
        |    / CAST(su.s4 AS DOUBLE) AS n_union_approx,
        |  (SELECT max(CASE WHEN grp = 'purchase' THEN e END)
        |        + max(CASE WHEN grp = 'click' THEN e END) FROM eg) AS n_sum_parts_approx
        |FROM su, x""".stripMargin) { (s, d) =>
      val f = T.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type").as("grp"), col("user_id")).distinct()
      val h = f.select(col("grp"),
        conv(substring(md5(col("user_id").cast(StringType)), 1, 15), 16, 10)
          .cast(LongType).as("h60"))
      val r = h.select(col("grp"), expr("h60 % 64").as("j"),
        when(expr("h60 div 64") === 0, 55)
          .otherwise(lit(55) - length(bin(expr("h60 div 64")))).as("rho"))
      val pg = r.groupBy(col("grp"), col("j")).agg(max(col("rho")).as("mj"))
      def s4Agg = (sum(expr(
          "CAST(shiftleft(CAST(1 AS BIGINT), CAST(62 - mj AS INT)) AS DECIMAL(38,0))"))
        + (lit(64) - count(lit(1))).cast(DecimalType(38, 0))
          * lit(4611686018427387904L).cast(DecimalType(38, 0))).as("s4")
      def estOfS4 = expr(
        "(CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096" +
          " * CAST(4611686018427387904 AS DOUBLE) / CAST(s4 AS DOUBLE)")
      val union = pg.groupBy(col("j")).agg(max(col("mj")).as("mj"))
        .agg(s4Agg).select(estOfS4.as("n_union_approx"))
      val parts = pg.groupBy(col("grp")).agg(s4Agg)
        .select(col("grp"), estOfS4.as("e"))
        .agg((max(when(col("grp") === "purchase", col("e")))
          + max(when(col("grp") === "click", col("e")))).as("n_sum_parts_approx"))
      f.agg(countDistinct(col("user_id")).as("n_union_exact"))
        .crossJoin(union).crossJoin(parts)
    },

    // A2 filtered row count (bp_user_operations.py:88-92).
    Q(
      "a2_filtered_count",
      "SELECT COUNT(*) AS total FROM orders WHERE o_orderstatus = 'O'") { (s, d) =>
      T.orders(s, d).filter(col("o_orderstatus") === "O")
        .agg(count(lit(1)).as("total"))
    },

    // A3 max-by / argmax lookup (scan_raw_txs.py:83 latest checkpoint).
    Q(
      "a3_maxby",
      """SELECT event_id, user_id, event_type, ts
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin) { (s, d) =>
      T.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .orderBy(col("ts").desc, col("event_id").desc).limit(1)
    },

    // ── P: projections / filters ───────────────────────────────────────────

    // P1 address-set filter (chain.py:18-37): membership on either of two
    // columns (to/from ∈ S) → here (event_type ∈ S1 OR user_id ∈ S2).
    Q(
      "p1_set_filter",
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE event_type IN ('signup','error') OR user_id IN (1,2,3)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_type").isin("signup", "error") || col("user_id").isin(1, 2, 3))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    },

    // P6 case-insensitive address match (bp_user_operations.py:34): the
    // reference's unanchored Mongo `$regex` is SUBSTRING semantics —
    // pinned here with a mixed-case PARTIAL needle ('UILDi' ∈ 'BUILDING'
    // case-folded) through the single shared predicate Api.ciMatch, the
    // same one the HTTP endpoints use.
    Q(
      "p6_ci_match",
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer WHERE contains(lower(c_mktsegment), lower('UILDi'))
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d)
        .filter(Api.ciMatch(col("c_mktsegment"), "UILDi"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // P7 excluded-events anti-filter (bp_user_operations.py:35).
    Q(
      "p7_excluded_events",
      """SELECT event_type, COUNT(*) AS n
        |FROM events
        |WHERE event_type NOT IN ('view','click')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(!col("event_type").isin("view", "click"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // P9 range predicates on block/time (historical.py:133 etc.).
    Q(
      "p9_range_pred",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType)
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType)
          && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // P10 wide projection (bp_user_operations.py:40-69).
    Q(
      "p10_projection",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },

    // P11 positive-balance predicate (mocsettlement.py:333) — Decimal, not
    // float, compare.
    Q(
      "p11_positive_balance",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) > 0
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d)
        .filter(d6(col("c_acctbal")) > 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // ── J: joins ───────────────────────────────────────────────────────────

    // J1 semi-join against a registry dim (token_riskpro.py:48-89).
    Q(
      "j1_semi_join",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val bld = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      T.orders(s, d)
        .join(broadcast(bld), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // J1b anti-join (P13 staleness guard pattern, moc_balances.py:123-136).
    Q(
      "j1b_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J2 equi lookup join by key (scan_events_txs.py:219-227).
    Q(
      "j2_equi_join",
      """SELECT o.o_orderkey, o.o_orderdate, c.c_name, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 100000
        |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).filter(col("o_totalprice") > 100000)
      val c = T.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    },

    // J2b multi-way dim join (dispatch-registry style J8 over a snowflake).
    Q(
      "j2b_multiway_join",
      """SELECT r.r_name, n.n_name, COUNT(*) AS n_cust,
        |  CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      val c = T.customer(s, d)
      val n = broadcast(T.nation(s, d))
      val r = broadcast(T.region(s, d))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), o6(sum(d6(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // ── W: windows / ranking ───────────────────────────────────────────────

    // W1 top-1 per key (argmax; bp_prices.py:34 latest price per query →
    // latest event per user).
    Q(
      "w1_top1_per_key",
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("user_id"))
    },

    // W1 at scale: top-K per key WITHOUT a window — the bounded typed
    // aggregator (graft.functions.BoundedTopK, the same machinery as the
    // vector rerank) partial-aggregates each map partition to ≤3 entries
    // per group before the shuffle, where the window form shuffles the
    // whole table to rank it. The production per-key-top-k shape at
    // 100 TB; the window form (w1_top1_per_key) stays as the reference
    // contrast.
    Q(
      "w1b_topk_per_key",
      """SELECT event_type, event_id, value, rnk FROM (
        |  SELECT event_type, event_id, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS BIGINT) AS rnk
        |  FROM events)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin) { (s, d) =>
      val top3 = udaf(graft.functions.BoundedTopK[Double](3))
      T.events(s, d)
        .groupBy(col("event_type"))
        .agg(top3(-col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("event_type"), col("t._2").as("event_id"),
          (-col("t._1")).as("value"), (col("r0") + 1).cast(LongType).as("rnk"))
        .orderBy(col("event_type"), col("rnk"))
    },

    // W2/O1 pagination: sort desc + offset/limit with clamp
    // (bp_user_operations.py:69, lib_tools.py:55-61).
    Q(
      "o1_pagination",
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC
        |LIMIT 20 OFFSET 20""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .offset(20).limit(20)
    },

    // O1b KEYSET (seek-method) pagination — the scale-correct form of O1:
    // page N via a composite-key range predicate instead of OFFSET. OFFSET
    // at depth k scans-and-discards k rows on every page (O(k) per page,
    // quadratic over a full crawl); the seek predicate is sargable — it
    // prunes at the scan (zone maps / parquet min-max on the sort key), so
    // every page costs the same regardless of depth. The cursor here is
    // derived in-query from page 2's last row ONLY to keep the query
    // self-contained and the oracle deterministic — a real client carries
    // the cursor from the previous response (api_tx_last's shape).
    Q(
      "o1b_keyset_pagination",
      """WITH cur AS (
        |  SELECT o_orderdate AS cd, o_orderkey AS ck FROM orders
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1 OFFSET 39)
        |SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders, cur
        |WHERE o_orderdate < cd OR (o_orderdate = cd AND o_orderkey < ck)
        |ORDER BY o_orderdate DESC, o_orderkey DESC
        |LIMIT 20""".stripMargin) { (s, d) =>
      val o = T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val cur = o.orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .offset(39).limit(1)
        .select(col("o_orderdate").as("cd"), col("o_orderkey").as("ck"))
      o.crossJoin(broadcast(cur))
        .filter(col("o_orderdate") < col("cd") ||
          (col("o_orderdate") === col("cd") && col("o_orderkey") < col("ck")))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(20)
    },

    // W4 lag over time ordering (bp_prices.py:44-61 ≈ 24h-ago comparison).
    Q(
      "w4_lag",
      """SELECT user_id, event_id, ts,
        |  value AS v,
        |  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
        |FROM events
        |WHERE user_id <= 50
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .filter(col("user_id") <= 50)
        .select(col("user_id"), col("event_id"), col("ts"), col("value").as("v"))
        .withColumn("prev_v", lag(col("v"), 1).over(w))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // A6 running count (historical.py:248-260 cursor counter). Global
    // row_number WITHOUT the single-partition window: two-pass rank.
    // Pass 1 ranks within coarse day buckets (parallel across buckets);
    // pass 2 broadcasts the per-bucket cumulative offsets (one row per
    // day — tiny) and adds. Bucket order is a prefix of (ts, event_id)
    // order, so bucket-major + local rank equals the global rank.
    Q(
      "a6_running_count",
      """SELECT event_id, ts,
        |  ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY rn""".stripMargin) { (s, d) =>
      val base = T.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"))
        .withColumn("bkt", date_trunc("DAY", col("ts")))
      val wLocal = Window.partitionBy(col("bkt")).orderBy(col("ts"), col("event_id"))
      // cumulative offsets over the per-bucket counts via the two-level
      // prefix sum (core.Prefix): bounded 256-row windows + a range join
      // on superbucket totals only — O(B²/65536), no single-partition
      // funnel even at millions of buckets.
      val counts = base.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      val offsets = graft.core.Prefix.exclusiveCumsum(counts, Seq(), "bkt",
        expr(s"unix_micros(bkt) div ${86400000000L * 256}"), "cnt")
      base
        .withColumn("local_rn", row_number().over(wLocal))
        .join(broadcast(offsets), Seq("bkt"))
        .select(col("event_id"), col("ts"),
          (col("offset") + col("local_rn")).cast("int").as("rn"))
        .orderBy(col("rn"))
    },

    // Rollup (engine extension — the reference has no grouping sets):
    // sub-total and grand-total rows in one pass, Decimal-pinned.
    Q(
      "q6_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(o6(sum(d6(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Cube (engine extension, completing the grouping-sets family next to
    // q6_rollup): all four grouping combinations in one pass. Spark plans
    // rollup/cube as a single Expand + one partial-agged aggregation — the
    // sub-totals cost one extra row per input row per grouping set, never
    // a second scan.
    Q(
      "q6b_cube",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(o6(sum(d6(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Q18 large-volume customer (the TPC-H big-agg classic): orders whose
    // total quantity clears a HAVING threshold, re-joined to their detail.
    // Spark shape: the `big` filter is a lineitem groupBy whose result
    // SEMI-joins orders BEFORE the wide customer/detail joins — the
    // having-driven pre-filter keeps the expensive join tree at the ~1%
    // of orders that qualify; TakeOrdered caps the output at 100 rows
    // without a global sort.
    Q(
      "q18_big_orders",
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 250)
        |SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |  CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val li = T.lineitem(s, d)
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(d6(col("l_quantity"))).cast(DoubleType).as("q"))
        .filter(col("q") > 250).select(col("l_orderkey"))
      val o = T.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      o.join(T.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(o6(sum(d6(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // P15 string-prefix scan — LIKE 'prefix%' is the one LIKE shape the
    // parquet reader can push down (StringStartsWith → a min/max-stats
    // range check per row group); PlanSpec asserts the filter reaches
    // PushedFilters, so a 100 TB name lookup reads only the row groups
    // whose stats ranges intersect the prefix.
    Q(
      "p15_prefix_scan",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_name LIKE 'Customer#0000001%'
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d)
        .filter(col("c_name").startsWith("Customer#0000001"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Q4 shape (order-priority checking): orders with at least one
    // late-shipped lineitem (EXISTS → left-semi with an equi key + residual
    // date condition — still a hash join), rolled up by priority. The
    // semi-join shape means the fact side is touched once and never
    // duplicated per matching lineitem.
    Q(
      "q4_priority_exists",
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = T.orders(s, d)
      val l = T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q14 shape (promotion revenue share): conditional revenue over total,
    // both sums exact in decimal and cast to double ONCE each before the
    // single division — the one-pass conditional-aggregate ratio (no
    // second scan for the denominator).
    Q(
      "q14_promo_share",
      """SELECT 100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS promo_share
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin) { (s, d) =>
      val rev = d6(col("l_extendedprice")) * (lit(1) - d6(col("l_discount")))
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0)
          * sum(when(col("p_type").like("PROMO%"), rev)
              .otherwise(d6(lit(0)))).cast(DoubleType)
          / sum(rev).cast(DoubleType)).as("promo_share"))
    },

    // Q6c GROUPING disambiguation — the rollup corner q6/q6b leave open:
    // a NULL in a rollup row is ambiguous between "subtotal level" and "the
    // data really was NULL"; GROUPING() resolves it, and the composed
    // grouping id doubles as the subtotal-level key a report pivots on.
    // Same single Expand + one partial-agged aggregation as the rollup
    // itself — the id is free.
    Q(
      "q6c_grouping_id",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg((grouping(col("l_returnflag")) * 2
          + grouping(col("l_linestatus"))).cast(LongType).as("gid"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // W8 RANGE-interval window frame (engine extension): per-user count of
    // events in the PRECEDING HOUR at each event — the rate-limit /
    // velocity feature shape. Spark's rangeBetween frame over a seconds
    // key computes it in one pass per partition; no self-join (the naive
    // formulation is an O(n·window) range join). Count only — a float SUM
    // in an incremental frame accumulates in frame order, which RANGE
    // semantics make engine-specific.
    Q(
      "w8_range_frame",
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      // frame key = unix_micros, not a seconds cast: events carry µs
      // precision and the INTERVAL oracle frame is µs-exact
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      T.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .orderBy(col("event_id"))
    },

    // U5/U6 intersect + except (engine extensions; SURVEY §2.7 notes the
    // reference has neither): purchasers who also clicked, and purchasers
    // who never errored.
    Q(
      "u5_intersect",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'click'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "click").select(col("user_id")))
        .orderBy(col("user_id"))
    },

    Q(
      "u6_except",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .except(ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id"))
    },

    // U8 bag-semantics set ops — INTERSECT ALL / EXCEPT ALL complete the
    // set-op family next to u5/u6's set semantics: multiplicities survive
    // (a user with 3 purchases and 2 errors keeps min(3,2)=2 rows in the
    // intersection, 1 in the difference). Spark plans both as a single
    // partial-agged count-compare per key — one shuffle, no join.
    Q(
      "u8_intersect_all",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersectAll(ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id"))
    },

    Q(
      "u8b_except_all",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .exceptAll(ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id"))
    },

    // P14 null-safe equality join — Spark's <=> against DuckDB's
    // IS NOT DISTINCT FROM: the semantic corner where a plain equi-join
    // silently DROPS the null group (null = null is null). The nullable
    // key is a nullif-derived bucket; the null-safe join keeps its row and
    // still plans as a hash join (null-safe equality is a valid hash key).
    Q(
      "p14_nullsafe_join",
      """WITH a AS (SELECT nullif(user_id % 10, 0) AS k, count(*) AS n_all
        |  FROM events GROUP BY 1),
        |b AS (SELECT nullif(user_id % 10, 0) AS k, count(*) AS n_purch
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT a.k, a.n_all, b.n_purch
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      def keyed(df: DataFrame, out: String) = df
        .groupBy(nullif(col("user_id") % 10, lit(0)).as("k"))
        .agg(count(lit(1)).as(out))
      val a = keyed(ev, "n_all")
      val b = keyed(ev.filter(col("event_type") === "purchase"), "n_purch")
        .withColumnRenamed("k", "bk")
      a.join(b, col("k") <=> col("bk"))
        .select(col("k"), col("n_all"), col("n_purch"))
        .orderBy(col("k").asc_nulls_first)
    },

    // U7 UNPIVOT — the melt side of the pivot pair (S5 covers wide-out;
    // this is long-out): the OHLC bars relation unpivoted to one
    // (day, metric, value) row per candle leg. Spark's native
    // DataFrame.unpivot is a zero-shuffle narrow map (each input row emits
    // its 4 legs locally) — at scale the melt adds no exchange at all.
    Q(
      "u7_unpivot",
      """WITH pe AS (
        |  SELECT date_trunc('day', ts) AS day, ts, event_id, value
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT day, value,
        |    first_value(value) OVER (PARTITION BY day ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(value)  OVER (PARTITION BY day ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM pe
        |), bars AS (
        |  SELECT day, min(o) AS open, max(value) AS high, min(value) AS low,
        |    min(c) AS close
        |  FROM w GROUP BY day)
        |SELECT day, metric, v
        |FROM (UNPIVOT bars ON open, high, low, close INTO NAME metric VALUE v)
        |ORDER BY day, metric""".stripMargin) { (s, d) =>
      Reports.ohlcBars(s, d)
        .select(col("day"), col("open"), col("high"), col("low"), col("close"))
        .unpivot(Array(col("day")),
          Array(col("open"), col("high"), col("low"), col("close")),
          "metric", "v")
        .orderBy(col("day"), col("metric"))
    },

    // W9 distribution-rank windows: percent_rank / cume_dist / ntile per
    // event_type — the remaining SQL rank family in one pass. All three
    // ride ONE sort within the type partition; percent_rank and cume_dist
    // are single exact integer divisions ((rank-1)/(n-1), rn/n) so the
    // doubles match DuckDB bitwise under the unique (value, event_id)
    // order.
    Q(
      "w9_rank_family",
      """SELECT event_id, event_type, value,
        |  percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr,
        |  cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd,
        |  ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
        |FROM events ORDER BY event_type, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      T.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(10).over(w).cast(LongType).as("decile"))
        .orderBy(col("event_type"), col("event_id"))
    },

    // Skew-salted join through the library operator: results must be a
    // drop-in replacement for the plain equi-join (the oracle IS the
    // plain join), while the big side scatters across salt sub-partitions
    // (graft.core.Skew scaladoc; SkewSpec covers the scatter property).
    Q(
      "s14_salted_join",
      """SELECT s.s_name, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin) { (s, d) =>
      val li = T.lineitem(s, d)
        .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      val supp = T.supplier(s, d).select(col("s_suppkey"), col("s_name"))
      graft.core.Skew.saltedJoin(li, supp, "s_suppkey", factor = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), o6(sum(d6(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("s_name"))
    },

    // W5 tumbling event-time window (T9 note: the engine exposes window()
    // for the extension ops even though the reference never windows):
    // daily event counts via Spark's window() operator — epoch-aligned
    // 1-day tumbling windows coincide with date_trunc on the oracle side.
    Q(
      "w5_tumbling_window",
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
      T.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("day"), col("n"), col("n_users"))
        .orderBy(col("day"))
    },

    // W6 sessionization: session_window (gap 30 min) per user — batch mode
    // of the Structured Streaming session operator; the oracle computes
    // identical sessions via the classic gaps-and-islands rewrite (new
    // island when the gap from the previous event exceeds 30 min).
    Q(
      "w6_session_window",
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTES
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM islands GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      T.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // W7 sliding (hopping) event-time window: 10-minute windows every
    // 5 minutes via Spark's window(ts, width, slide) — each event lands in
    // exactly width/slide = 2 windows, so the operator is a 2× explode +
    // one partial-agged groupBy, NOT a self-join (the naive range-join
    // formulation shuffles the event table against the window table; the
    // slot arithmetic keeps it a narrow map at any scale). The oracle
    // derives the same two epoch-aligned starts per event arithmetically.
    // No float SUM in the output (count/distinct only) — the overlap
    // duplication would otherwise double float accumulation-order surface.
    Q(
      "w7_sliding_window",
      """WITH slots AS (
        |  SELECT user_id,
        |    to_timestamp(CAST(floor(epoch(ts)/300) AS BIGINT)*300) AS s0
        |  FROM events),
        |two AS (
        |  SELECT s0 AS wstart, user_id FROM slots
        |  UNION ALL
        |  SELECT s0 - INTERVAL 5 MINUTES AS wstart, user_id FROM slots)
        |SELECT CAST(wstart AS TIMESTAMP) AS wstart, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM two GROUP BY 1 ORDER BY wstart""".stripMargin) { (s, d) =>
      T.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("wstart"), col("n"), col("n_users"))
        .orderBy(col("wstart"))
    },

    // ── U: set operations ──────────────────────────────────────────────────

    // U3 schema union of heterogeneous event shapes (unionByName with
    // missing columns; events/* writers).
    Q(
      "u3_union_by_name",
      """SELECT event_id, user_id, value, NULL AS props FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, NULL AS value, props FROM events WHERE event_type = 'signup'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      val b = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("props"))
      a.unionByName(b, allowMissingColumns = true)
        .select(col("event_id"), col("user_id"), col("value"), col("props"))
        .orderBy(col("event_id"))
    },

    // U4 two legs of one event unioned (token_riskpro.py:54-122: from-side
    // isPositive=false, to-side isPositive=true).
    Q(
      "u4_two_legs",
      """SELECT event_id, user_id AS account, FALSE AS is_positive, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id + 1000000 AS account, TRUE AS is_positive, value FROM events WHERE event_type = 'click'
        |ORDER BY event_id, account""".stripMargin) { (s, d) =>
      val t = T.events(s, d).filter(col("event_type") === "click")
      val fromLeg = t.select(col("event_id"), col("user_id").as("account"),
        lit(false).as("is_positive"), col("value"))
      val toLeg = t.select(col("event_id"),
        (col("user_id") + 1000000).as("account"), lit(true).as("is_positive"), col("value"))
      fromLeg.union(toLeg).orderBy(col("event_id"), col("account"))
    }
  )
}
