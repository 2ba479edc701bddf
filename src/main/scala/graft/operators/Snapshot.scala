package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

/** Snapshot assembly + report scalars — SURVEY.md §2.4 A4/A5 and §2.8 F24:
  * the reference's wide point-in-time state documents (moc_state.py:140-221
  * assembles ~50 scalar reads + nested sub-docs into one MocState doc) and
  * the console TVL report (report/historical.py:106-121).
  *
  * The snapshot query builds a genuinely nested row (struct-in-struct) per
  * key and serializes it with to_json (F24, lib_tools.py:34-35) — field
  * order is schema order on both engines, and all leaves are integers so
  * rendering is byte-identical. Scale: one groupBy(user_id) with map-side
  * combine; the JSON projection is narrow.
  */
object Snapshot {

  private val MocRateKeys = Seq(
    "MINT_BPRO_FEES_RBTC", "REDEEM_BPRO_FEES_RBTC",
    "MINT_DOC_FEES_RBTC", "REDEEM_DOC_FEES_RBTC",
    "MINT_BTCX_FEES_RBTC", "REDEEM_BTCX_FEES_RBTC",
    "MINT_BPRO_FEES_MOC", "REDEEM_BPRO_FEES_MOC",
    "MINT_DOC_FEES_MOC", "REDEEM_DOC_FEES_MOC",
    "MINT_BTCX_FEES_MOC", "REDEEM_BTCX_FEES_MOC")

  /** the MocState document derivation from a `(block_height, mu, cnt)`
    * aggregate — ONE definition shared by the `s15_mocstate_doc` batch
    * query and the app shell's `scan_moc_state` task, so the
    * streaming-folded state equals the batch query by construction
    * (AppBootSpec asserts the equality). The per-height aggregate itself
    * is mergeable (max(mu) / sum(cnt)), which is what lets the task fold
    * batch partials into state without re-reading history. */
  def mocStateDoc(g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.Wei
    val dec = DecimalType(38, 0)
    val W = lit(new java.math.BigDecimal("1000000000000000000"))
    val btc = ((col("mu") % 10 + 10).cast(dec).multiply(W)).cast(dec)
    val bprox2 = ((col("mu") % 5 + 1).cast(dec).multiply(W)).cast(dec)
    val mapArgs = MocRateKeys.zipWithIndex.flatMap { case (k, i) =>
      Seq(lit(k),
        ((col("block_height") % 100 + i).cast(dec) * 1000000000000L)
          .cast(dec).cast(StringType))
    }
    g.select(
      col("block_height"),
      btc.cast(StringType).as("bitcoin_price"),
      bprox2.cast(StringType).as("bprox2_price_rbtc"),
      Wei.toWeiStr(Wei.usdAmount(bprox2, btc)).as("bprox2_price_usd"),
      (lit(100) - col("block_height") % 100).as("blocks_to_settlement"),
      (col("cnt") % 4).as("state"),
      (col("block_height") % 7 === 0).as("paused"),
      to_json(map(mapArgs: _*)).as("commission_rates"))
  }

  val queries: Seq[Q] = Seq(

    // A4 wide-struct snapshot per key + F24 JSON serialization: per-user
    // state doc with counts, argmax pointer, and a nested per-type
    // breakdown — the UserState/MocState document shape.
    Q(
      "a4_snapshot_struct",
      """SELECT user_id,
        |  to_json(struct_pack(
        |    user_id := user_id,
        |    n_events := n_events,
        |    last_event := last_event,
        |    by_type := struct_pack(n_purchase := n_purchase, n_view := n_view)
        |  )) AS snapshot
        |FROM (
        |  SELECT user_id, COUNT(*) AS n_events, MAX(event_id) AS last_event,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |    COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      T.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          max(col("event_id")).as("last_event"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "view", 1)).as("n_view"))
        .select(col("user_id"),
          to_json(struct(
            col("user_id"),
            col("n_events"),
            col("last_event"),
            struct(col("n_purchase"), col("n_view")).as("by_type"))).as("snapshot"))
        .orderBy(col("user_id"))
    },

    // S5 snapshot source pivot (moc_state.py:28-132 multicall: N named
    // reads fanned into one wide row): the long-format state relation
    // pivots to one wide row per key — Spark's relational pivot operator
    // with the value set pinned (no extra distinct pass), absent cells
    // zero-filled.
    Q(
      "s5_snapshot_pivot",
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val types = Seq("purchase", "view", "click", "signup", "error")
      val pivoted = T.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      pivoted.select(col("user_id") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    },

    // S5 at FULL document depth: the MocState doc per height bucket with
    // the reference's two derivation quirks — bprox2PriceInUsd computed
    // FROM already-assembled fields (moc_state.py:208-211:
    // bprox2PriceInRbtc * bitcoinPrice // reservePrecision, exact integer
    // math through the wei expressions) and the 12-slot
    // commissionRatesTypes fee map (moc_state.py:232-265) rendered as a
    // JSON object (F24). One grouped pass, map-side combine, narrow JSON
    // projection — the Schemas.mocState document shape as a derivation.
    Q(
      "s15_mocstate_doc", {
        val rateKeys = Seq(
          "MINT_BPRO_FEES_RBTC", "REDEEM_BPRO_FEES_RBTC",
          "MINT_DOC_FEES_RBTC", "REDEEM_DOC_FEES_RBTC",
          "MINT_BTCX_FEES_RBTC", "REDEEM_BTCX_FEES_RBTC",
          "MINT_BPRO_FEES_MOC", "REDEEM_BPRO_FEES_MOC",
          "MINT_DOC_FEES_MOC", "REDEEM_DOC_FEES_MOC",
          "MINT_BTCX_FEES_MOC", "REDEEM_BTCX_FEES_MOC")
        val jsonArgs = rateKeys.zipWithIndex.map { case (k, i) =>
          s"'$k', CAST(CAST(block_height % 100 + $i AS HUGEINT) * 1000000000000 AS VARCHAR)"
        }.mkString(", ")
        s"""WITH g AS (
           |  SELECT event_id // 100 AS block_height,
           |    max(user_id) AS mu, count(*) AS cnt
           |  FROM events GROUP BY 1),
           |doc AS (
           |  SELECT block_height,
           |    CAST(10 + mu % 10 AS HUGEINT) * 1000000000000000000 AS btc,
           |    CAST(1 + mu % 5 AS HUGEINT) * 1000000000000000000 AS bprox2,
           |    cnt
           |  FROM g)
           |SELECT block_height,
           |  CAST(btc AS VARCHAR) AS bitcoin_price,
           |  CAST(bprox2 AS VARCHAR) AS bprox2_price_rbtc,
           |  CAST(bprox2 * (btc // 1000000000000000000) AS VARCHAR) AS bprox2_price_usd,
           |  100 - block_height % 100 AS blocks_to_settlement,
           |  cnt % 4 AS state,
           |  block_height % 7 = 0 AS paused,
           |  CAST(json_object($jsonArgs) AS VARCHAR) AS commission_rates
           |FROM doc ORDER BY block_height""".stripMargin
      }) { (s, d) =>
      val g = T.events(s, d)
        .groupBy(expr("event_id div 100").as("block_height"))
        .agg(max(col("user_id")).as("mu"), count(lit(1)).as("cnt"))
      mocStateDoc(g).orderBy(col("block_height"))
    },

    // A5 TVL / protocol report scalars (historical.py:106-121): single-row
    // multi-aggregate with the Decimal round-trip pinning the doubles and a
    // display scale-down (F21) as one deterministic IEEE op at the end.
    Q(
      "a5_tvl_scalars",
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS tvl,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS tvl_discounted,
        |  COUNT(*) AS n_items,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / 10000.0 AS tvl_scaled
        |FROM lineitem""".stripMargin) { (s, d) =>
      def d4(c: String) = col(c).cast(DecimalType(18, 4))
      def o4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 4)).cast(DoubleType)
      T.lineitem(s, d)
        .agg(
          o4(sum(d4("l_extendedprice"))).as("tvl"),
          o4(sum(d4("l_extendedprice") * (lit(1) - d4("l_discount")))).as("tvl_discounted"),
          count(lit(1)).as("n_items"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          (o4(sum(d4("l_extendedprice"))) / 10000.0).as("tvl_scaled"))
    },

    // S16 SCD-2 history build: the versioned-dimension shape §7.4 risk 3
    // calls for — every event closes the previous state row for its user
    // (valid_to = next valid_from, NULL while current). ONE keyed shuffle
    // (window by user_id); event_id breaks timestamp ties so the history
    // is total-ordered on both engines. This is the batch construction of
    // the table the as-of family (J5/J7b) queries point-in-time.
    Q(
      "s16_scd2_build",
      """SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },

    // S17 snapshot diff (CDC shape): latest state per user as of the
    // time-range midpoint vs as of now, classified added/changed/unchanged
    // per user by a full-outer join of the two last-row-per-key passes.
    // ('removed' cannot arise from a grow-only event log; the branch is the
    // CASE's ELSE so a retention-pruned input would still classify.) Both
    // passes shuffle once on user_id; the midpoint is a broadcast scalar.
    Q(
      "s17_snapshot_diff",
      """WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cutus FROM events),
        |r AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_new
        |  FROM events),
        |newest AS (SELECT user_id, event_type AS new_state FROM r WHERE rn_new = 1),
        |oldr AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        |  FROM r, b WHERE us <= cutus),
        |oldest AS (SELECT user_id, event_type AS old_state FROM oldr WHERE rn = 1)
        |SELECT coalesce(n.user_id, o.user_id) AS user_id, o.old_state, n.new_state,
        |  CASE WHEN o.user_id IS NULL THEN 'added'
        |       WHEN n.user_id IS NULL THEN 'removed'
        |       WHEN n.new_state <> o.old_state THEN 'changed'
        |       ELSE 'unchanged' END AS change_type
        |FROM newest n FULL OUTER JOIN oldest o ON n.user_id = o.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val cut = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("cutus"))
      val wNew = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val newest = ev.withColumn("rn", row_number().over(wNew)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("new_state"))
      val oldest = ev.crossJoin(broadcast(cut))
        .filter(unix_micros(col("ts")) <= col("cutus"))
        .withColumn("rn", row_number().over(wNew)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("old_state"))
      newest.as("n").join(oldest.as("o"), col("n.user_id") === col("o.user_id"), "full_outer")
        .select(
          coalesce(col("n.user_id"), col("o.user_id")).as("user_id"),
          col("old_state"), col("new_state"),
          when(col("o.user_id").isNull, "added")
            .when(col("n.user_id").isNull, "removed")
            .when(col("new_state") =!= col("old_state"), "changed")
            .otherwise("unchanged").as("change_type"))
        .orderBy(col("user_id"))
    },

    // S18 gap detection — the backfill scanner an indexer needs when the
    // cursor claims progress but rows are missing (the reference's
    // unprocessed-blocks rescue, S4/moc_indexer task scans, turned into a
    // set-level audit): find every missing id RANGE in the processed
    // sequence. The naive formulation is lag() over a GLOBAL id order — a
    // single-partition sort at any real scale. Rewritten two-level: ids
    // bucket by `id div 1024`, in-bucket gaps come from a lag over the
    // bucket partition (parallel, the only pass that touches every row),
    // and cross-bucket/whole-missing-bucket gaps come from a lag over the
    // per-bucket min/max SUMMARY — 1024× smaller than the data; the same
    // rewrite applies recursively if summaries themselves outgrow one
    // partition (the core/Prefix two-pass argument).
    Q(
      "s18_gap_detect",
      """WITH p AS (SELECT event_id AS id FROM events WHERE event_type <> 'error'),
        |g AS (SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM p)
        |SELECT prev + 1 AS gap_start, id - 1 AS gap_end, id - prev - 1 AS n_missing
        |FROM g WHERE prev IS NOT NULL AND id - prev > 1
        |ORDER BY gap_start""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val p = T.events(s, d).filter(col("event_type") =!= "error")
        .select(col("event_id").as("id"))
        .withColumn("bucket", expr("id div 1024"))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("id"))
      val internal = p.withColumn("prev", lag(col("id"), 1).over(wIn))
        .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
        .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))
      val summ = p.groupBy(col("bucket"))
        .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      // summary-level window: 1024×-reduced input, the bounded tier
      val wS = Window.orderBy(col("bucket"))
      val boundary = summ.withColumn("pmx", lag(col("mx"), 1).over(wS))
        .filter(col("pmx").isNotNull && col("mn") - col("pmx") > 1)
        .select((col("pmx") + 1).as("gap_start"), (col("mn") - 1).as("gap_end"))
      internal.unionAll(boundary)
        .select(col("gap_start"), col("gap_end"),
          (col("gap_end") - col("gap_start") + 1).as("n_missing"))
        .orderBy(col("gap_start"))
    }
  )
}
