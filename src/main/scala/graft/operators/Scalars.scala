package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}
import graft.functions.Wei

/** Scalar-function coverage — SURVEY.md §2.8 F7-F23 (the non-money rows;
  * F1-F6 live in graft.functions.Wei with unit vectors).
  *
  * Each query exercises a function family end-to-end with a DuckDB oracle.
  * Doubles that are merely transformed row-wise (no aggregation) are safe
  * for exact compare: both engines evaluate the identical IEEE expression
  * tree per row.
  */
object Scalars {

  val queries: Seq[Q] = Seq(

    // F7 lower / F8 hex / F9 casts / F23 hex-address validation
    // (chain.py:26-35, lib_tools.py:28-31).
    Q(
      "f_string_suite",
      """SELECT event_id,
        |  lower(event_type) AS f7_lower,
        |  '0x' || lower(hex(event_id)) AS f8_hex,
        |  CAST(user_id AS VARCHAR) AS f9_str,
        |  regexp_matches('0x' || lower(hex(event_id)), '^0[xX][0-9a-fA-F]+$') AS f23_valid,
        |  upper(event_type) AS up, length(event_type) AS len,
        |  substr(event_type, 1, 3) AS pre, concat(event_type, ':', CAST(user_id AS VARCHAR)) AS tagged
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      T.events(s, d).select(
          col("event_id"),
          lower(col("event_type")).as("f7_lower"),
          concat(lit("0x"), lower(hex(col("event_id")))).as("f8_hex"),
          col("user_id").cast(StringType).as("f9_str"),
          concat(lit("0x"), lower(hex(col("event_id")))).rlike("^0[xX][0-9a-fA-F]+$").as("f23_valid"),
          upper(col("event_type")).as("up"),
          length(col("event_type")).as("len"),
          substring(col("event_type"), 1, 3).as("pre"),
          concat(col("event_type"), lit(":"), col("user_id").cast(StringType)).as("tagged"))
        .orderBy(col("event_id"))
    },

    // F10 code→label map (mocstate.py:11-16 d_states) + F20 display
    // translation (historical.py:11-20) as a literal lookup.
    Q(
      "f10_state_map",
      """SELECT event_id,
        |  CASE user_id % 4 WHEN 0 THEN 'Liquidated' WHEN 1 THEN 'BProDiscount'
        |                   WHEN 2 THEN 'BelowCobj' ELSE 'AboveCobj' END AS state_name
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val states = typedLit(Map(0 -> "Liquidated", 1 -> "BProDiscount", 2 -> "BelowCobj", 3 -> "AboveCobj"))
      T.events(s, d).select(
          col("event_id"),
          element_at(states, (col("user_id") % 4).cast(IntegerType)).as("state_name"))
        .orderBy(col("event_id"))
    },

    // F11 string-boolean coercion (mocsettlement.py:97-104 'True'/'False').
    Q(
      "f11_bool_coercion",
      """SELECT event_id, raw_flag,
        |  CASE WHEN raw_flag IN ('True','true') THEN TRUE ELSE FALSE END AS is_addition
        |FROM (SELECT event_id,
        |        CASE user_id % 3 WHEN 0 THEN 'True' WHEN 1 THEN 'false' ELSE 'False' END AS raw_flag
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      T.events(s, d)
        .select(col("event_id"),
          when(col("user_id") % 3 === 0, "True")
            .when(col("user_id") % 3 === 1, "false")
            .otherwise("False").as("raw_flag"))
        .withColumn("is_addition", col("raw_flag").isin("True", "true"))
        .orderBy(col("event_id"))
    },

    // F12/F13/W3 status derivation against the chain head
    // (events/events.py:12-21; scan_transaction_status.py:34-46):
    // confirmed when head - h > confirm_blocks, else confirming with
    // percent = min((head-h)*10, 100).
    Q(
      "f12_status_confirmations",
      """SELECT event_id,
        |  CASE WHEN head - event_id > 10 THEN 'confirmed' ELSE 'confirming' END AS status,
        |  CASE WHEN head - event_id > 10 THEN 100
        |       ELSE LEAST((head - event_id) * 10, 100) END AS confirming_percent
        |FROM (SELECT event_id, MAX(event_id) OVER () AS head FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // chain head is a scalar: one-row aggregate broadcast to every row —
      // never an unpartitioned window (that funnels the table through one
      // partition). Same shape as EventPipeline/Sinks head computation.
      val ev = T.events(s, d)
      val head = ev.agg(max(col("event_id")).as("head"))
      ev
        .crossJoin(broadcast(head))
        .select(col("event_id"),
          when(col("head") - col("event_id") > 10, "confirmed").otherwise("confirming").as("status"),
          when(col("head") - col("event_id") > 10, lit(100L))
            .otherwise(least((col("head") - col("event_id")) * 10, lit(100L))).as("confirming_percent"))
        .orderBy(col("event_id"))
    },

    // F14 unix→timestamp, F16 interval arithmetic + midnight floor,
    // F17 ISO-8601 millis formatting (chain.py:84; bp_prices.py:44-45;
    // lib_tools.py:20-21).
    Q(
      "f_datetime_suite",
      """SELECT event_id,
        |  make_timestamp((1700000000 + event_id) * 1000000) AS f14_from_unix,
        |  ts - INTERVAL 24 HOURS AS f16_minus_24h,
        |  CAST(date_trunc('day', ts - INTERVAL 24 HOURS) AS TIMESTAMP) AS f16_floor_midnight,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS f17_iso,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS f17_unix
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      T.events(s, d).select(
          col("event_id"),
          timestamp_seconds(lit(1700000000L) + col("event_id")).as("f14_from_unix"),
          (col("ts") - expr("INTERVAL 24 HOURS")).as("f16_minus_24h"),
          date_trunc("DAY", col("ts") - expr("INTERVAL 24 HOURS")).as("f16_floor_midnight"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("f17_iso"),
          unix_timestamp(col("ts")).as("f17_unix"))
        .orderBy(col("event_id"))
    },

    // F21/F22 scale-down + derived price (historical.py:107-121,
    // moc_prices.py:64-66): identical row-wise IEEE double expressions.
    Q(
      "f21_derived_price",
      """SELECT event_id,
        |  value / 100.0 AS scaled,
        |  value * CAST(user_id + 1 AS DOUBLE) / 1000.0 AS derived_price
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      T.events(s, d).select(
          col("event_id"),
          (col("value") / 100.0).as("scaled"),
          (col("value") * (col("user_id") + 1).cast(DoubleType) / 1000.0).as("derived_price"))
        .orderBy(col("event_id"))
    },

    // F1-F3 wei money pipeline over the oracle (mocexchange.py:46-50):
    // synthesize exact wei-integer columns from testdata decimals, then
    // fromWei → multiply → toWeiStr; string outputs round-trip exactly.
    Q(
      "f_wei_money",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100000000000000 AS DECIMAL(38,0)) AS VARCHAR) AS amount_wei,
        |  CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100000000000000 AS DECIMAL(38,0)) * 2 AS DECIMAL(38,0)) AS VARCHAR) AS doubled_wei,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) / 10000.0 AS DOUBLE) AS ether_approx
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val wei = (col("l_extendedprice").cast(DecimalType(18, 4)) * lit(100000000000000L)).cast(DecimalType(38, 0))
      T.lineitem(s, d).filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          wei.cast(StringType).as("amount_wei"),
          (wei * 2).cast(DecimalType(38, 0)).cast(StringType).as("doubled_wei"),
          (col("l_extendedprice").cast(DecimalType(18, 4)) / 10000.0).cast(DoubleType).as("ether_approx"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // F24 (parse direction): the reference consumes BSON documents; here
    // the JSON payload column is parsed two ways — path extraction
    // (get_json_object) and schema-full parse (from_json → typed struct) —
    // then bucketed. Both are codegen'd built-ins; no UDF.
    Q(
      "f_json_suite",
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val parsed = from_json(col("props"),
        StructType(Seq(StructField("k", LongType))))
      T.events(s, d).select(
          col("event_id"),
          parsed.getField("k").as("k_val"),
          (get_json_object(col("props"), "$.k").cast(LongType) % 10).as("k_bucket"),
          get_json_object(col("props"), "$.missing").cast(LongType).as("absent"))
        .orderBy(col("event_id"))
    },

    // F4 commission markup fallback (mocexchange.py:56-68): rbtc leg =
    // commission + coalesce(reserveTokenMarkup, btcMarkup); usd leg picks
    // rbtc×reservePrice when rbtc > 0, else moc×mocPrice. Wei values are
    // synthesized per user; the DuckDB oracle computes the same pipeline in
    // HUGEINT (// truncates toward zero, matching toWeiStr).
    Q(
      "f4_commission_fallback",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |w AS (SELECT user_id,
        |  CAST(user_id % 7 AS HUGEINT) * 1000000000000000 AS comm,
        |  CASE WHEN user_id % 2 = 0 THEN NULL
        |       ELSE CAST(user_id % 5 AS HUGEINT) * 100000000000000 END AS rtm,
        |  CAST(user_id % 7 AS HUGEINT) * 100000000000000 AS bm,
        |  CAST(user_id % 20 + 1 AS HUGEINT) * 1000000000000000 AS mcv,
        |  CAST(user_id % 10 AS HUGEINT) * 100000000000000 AS mm,
        |  CAST(CAST(100 + user_id % 100 AS VARCHAR)||'000000000000000000' AS HUGEINT) AS rp,
        |  CAST(CAST(50 + user_id % 50 AS VARCHAR)||'000000000000000000' AS HUGEINT) AS mp
        |FROM u),
        |c AS (SELECT user_id, comm + COALESCE(rtm, bm) AS rbtc, mcv + mm AS moc, rp, mp FROM w)
        |SELECT user_id,
        |  CAST(rbtc AS VARCHAR) AS rbtc_wei,
        |  CAST(moc AS VARCHAR) AS moc_wei,
        |  CAST(CASE WHEN rbtc > 0 THEN (rbtc * rp) // 1000000000000000000
        |            ELSE (moc * mp) // 1000000000000000000 END AS VARCHAR) AS usd_wei
        |FROM c ORDER BY user_id""".stripMargin) { (s, d) =>
      val base = T.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"),
          ((col("user_id") % 7) * 1000000000000000L).as("comm"),
          when(col("user_id") % 2 === 0, lit(null).cast(LongType))
            .otherwise((col("user_id") % 5) * 100000000000000L).as("rtm"),
          ((col("user_id") % 7) * 100000000000000L).as("bm"),
          ((col("user_id") % 20 + 1) * 1000000000000000L).as("mcv"),
          ((col("user_id") % 10) * 100000000000000L).as("mm"),
          concat((lit(100) + col("user_id") % 100).cast(StringType),
            lit("0" * 18)).as("rp"),
          concat((lit(50) + col("user_id") % 50).cast(StringType),
            lit("0" * 18)).as("mp"))
      val (rbtc, moc, usd) = Wei.commissions(
        col("comm"), col("rtm"), col("bm"), col("mcv"), col("mm"),
        col("rp"), col("mp"))
      base.select(col("user_id"),
          Wei.toWeiStr(rbtc).as("rbtc_wei"),
          Wei.toWeiStr(moc).as("moc_wei"),
          Wei.toWeiStr(usd).as("usd_wei"))
        .orderBy(col("user_id"))
    },

    // F5 gas fee (mocexchange.py:76-83): gasFeeRBTC = gasUsed ×
    // fromWei(gasPrice) re-scaled to wei; gasFeeUSD prices it at the
    // reserve price. Both exact; the oracle is pure HUGEINT arithmetic.
    Q(
      "f5_gas_fee",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |w AS (SELECT user_id,
        |  21000 + user_id AS gas_used,
        |  (user_id % 100 + 1) * 1000000000 AS gas_price,
        |  CAST(CAST(100 + user_id % 100 AS VARCHAR)||'000000000000000000' AS HUGEINT) AS rp
        |FROM u)
        |SELECT user_id,
        |  CAST(CAST(gas_used AS HUGEINT) * gas_price AS VARCHAR) AS gas_fee_rbtc_wei,
        |  CAST((CAST(gas_used AS HUGEINT) * gas_price * rp)
        |       // 1000000000000000000 AS VARCHAR) AS gas_fee_usd_wei
        |FROM w ORDER BY user_id""".stripMargin) { (s, d) =>
      val base = T.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"),
          (lit(21000) + col("user_id")).as("gas_used"),
          ((col("user_id") % 100 + 1) * 1000000000L).as("gas_price"),
          concat((lit(100) + col("user_id") % 100).cast(StringType),
            lit("0" * 18)).as("rp"))
      val fee = Wei.gasFee(col("gas_used"), col("gas_price"))
      base.select(col("user_id"),
          Wei.toWeiStr(fee).as("gas_fee_rbtc_wei"),
          Wei.toWeiStr(Wei.mulExact(fee, Wei.weiToDec(col("rp")))).as("gas_fee_usd_wei"))
        .orderBy(col("user_id"))
    },

    // F6 signed totals (mocexchange.py:84-89 mint, :174-181 redeem): mint
    // adds commission/interests/gas, redeem subtracts — redeem totals go
    // NEGATIVE when fees exceed the reserve amount, and the usd total must
    // truncate toward zero on those (Python int() semantics; DuckDB //
    // matches, floor would not).
    Q(
      "f6_signed_totals",
      """WITH w AS (SELECT event_id,
        |  CAST(event_id % 1000 AS HUGEINT) * 100000000000000 AS rt,
        |  CAST(user_id % 100 + 1 AS HUGEINT) * 100000000000000 AS comm,
        |  CASE WHEN event_id % 3 = 0 THEN NULL
        |       ELSE CAST(event_id % 50 AS HUGEINT) * 10000000000000 END AS ints,
        |  CAST(21000 + user_id AS HUGEINT) * ((user_id % 100 + 1) * 1000000000) AS gas_wei,
        |  CAST(CAST(100 + user_id % 100 AS VARCHAR)||'000000000000000000' AS HUGEINT) AS rp
        |FROM events),
        |t AS (SELECT event_id,
        |  rt + comm + COALESCE(ints, 0) + gas_wei AS mint_wei,
        |  rt - comm + COALESCE(ints, 0) - gas_wei AS redeem_wei, rp FROM w)
        |SELECT event_id,
        |  CAST(mint_wei AS VARCHAR) AS mint_wei,
        |  CAST(redeem_wei AS VARCHAR) AS redeem_wei,
        |  CAST((redeem_wei * rp) // 1000000000000000000 AS VARCHAR) AS redeem_usd_wei
        |FROM t ORDER BY event_id""".stripMargin) { (s, d) =>
      val base = T.events(s, d)
        .select(col("event_id"),
          ((col("event_id") % 1000) * 100000000000000L).as("rt"),
          ((col("user_id") % 100 + 1) * 100000000000000L).as("comm"),
          when(col("event_id") % 3 === 0, lit(null).cast(LongType))
            .otherwise((col("event_id") % 50) * 10000000000000L).as("ints"),
          (lit(21000) + col("user_id")).as("gas_used"),
          ((col("user_id") % 100 + 1) * 1000000000L).as("gas_price"),
          concat((lit(100) + col("user_id") % 100).cast(StringType),
            lit("0" * 18)).as("rp"))
      val fee = Wei.gasFee(col("gas_used"), col("gas_price"))
      val mint = Wei.mintTotalWei(col("rt"), col("comm"), col("ints"), fee)
      val redeem = Wei.redeemTotalWei(col("rt"), col("comm"), col("ints"), fee)
      base.select(col("event_id"),
          mint.cast(StringType).as("mint_wei"),
          redeem.cast(StringType).as("redeem_wei"),
          Wei.toWeiStr(Wei.usdTotal(redeem, col("rp"))).as("redeem_usd_wei"))
        .orderBy(col("event_id"))
    }
  )
}
