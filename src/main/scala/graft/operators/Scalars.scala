package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

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
      val wAll = Window.partitionBy()
      T.events(s, d)
        .withColumn("head", max(col("event_id")).over(wAll))
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
    }
  )
}
