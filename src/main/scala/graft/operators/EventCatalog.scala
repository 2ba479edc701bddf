package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}
import graft.functions.Wei

/** The reference's FULL event catalog as oracle-checked pipelines —
  * SURVEY.md §2 "what the indexer derives", completing tx_union_canonical
  * (EventUnion) to all 21+ event types the handlers under indexer/events/
  * produce, each with its specific formula quirks:
  *
  *  - tx_exchange_ops: the seven mocexchange operations with the ×6
  *    repeated commission/total block (mocexchange.py:55-90,153-181,
  *    246-276,341-374,437-465,527-553,619-652) — per-op RBTCTotal sign
  *    structure, markup fallback commission, StableTokenMint's
  *    userAmount-from-reserveTotal quirk (:429-430).
  *  - tx_notifications: the Notification-collection writers — settlement
  *    start/close, redeem queue notification, interest payouts, bucket
  *    liquidation, contract liquidation, state transitions through the
  *    d_states code map (mocsettlement.py:25-60,234-259; mocinrate.py:42-61,
  *    108-131; moc.py:16-98,127-205; mocstate.py:11-44).
  *  - tx_redeem_lifecycle: the settlement redeem-request fold —
  *    RedeemRequestAlter ±delta by isAddition (mocsettlement.py:86-97),
  *    RedeemRequestProcessed drains (:170-189), and the retention delete of
  *    requests at-or-below the completed settlement height (:416-429).
  *  - tx_fastbtc_status: FastBtcBridge PEG_OUT lifecycle — insert on
  *    NewBitcoinTransfer (status 0, fastbtcbridge.py:13-39), conditional
  *    status patch (upsert=False — updates must NOT create rows) on
  *    BitcoinTransferStatusUpdated (:56-72), folded to latest status.
  *
  * All pipelines are single-pass column programs over the synthesized
  * payload (CASE dispatch on a derived op code — one scan, no union, no
  * shuffle before the final ORDER BY); money math goes through the exact
  * wei library (graft.functions.Wei), oracle-checked in DuckDB HUGEINT.
  */
object EventCatalog {

  private val Wei18 = "1000000000000000000" // 10^18

  /** shared synthesized payload: all quantities wei-scale integers, built
    * in Decimal(38,0) (reserve_total can exceed Long range at high sf). */
  private def base(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def d38(c: Column): Column = c.cast(dec)
    T.events(s, d).select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      concat(lit("0xa"), col("user_id").cast(StringType)).as("addr"),
      md5(col("event_id").cast(StringType)).as("tx_hash"),
      (d38(floor(col("value") * 100)) + 10)
        .multiply(lit(new java.math.BigDecimal("1000000000000000"))).cast(dec)
        .as("reserve_total"),
      (d38(col("user_id")) + 1)
        .multiply(lit(new java.math.BigDecimal("1000000000000"))).cast(dec)
        .as("amount"),
      when(col("user_id") % 10 === 0, d38(lit(0)))
        .otherwise((d38(col("event_id") % 1000) * 1000000000L).cast(dec))
        .as("commission"),
      when(col("user_id") % 10 === 0, d38(lit(0)))
        .otherwise((d38(col("user_id") % 100) * 1000000000L).cast(dec))
        .as("btc_markup"),
      (d38(col("event_id") % 7) * 1000000000L).cast(dec).as("moc_commission_value"),
      (d38(col("user_id") % 3) * 1000000000L).cast(dec).as("moc_markup"),
      (d38(col("user_id") % 10) + 10)
        .multiply(lit(new java.math.BigDecimal(Wei18))).cast(dec).as("reserve_price"),
      (d38(col("user_id") % 5) + 5)
        .multiply(lit(new java.math.BigDecimal(Wei18))).cast(dec).as("moc_price"),
      (d38(col("event_id") % 1000) + 21000).cast(dec).as("gas_used"),
      (d38(col("user_id")) + 1000000000L).cast(dec).as("gas_price"),
      (d38(col("event_id") % 500) * 1000000000L).cast(dec).as("interests"))
  }

  /** identical synthesis in DuckDB (HUGEINT domain) */
  private val BaseCte =
    s"""base AS (
       |  SELECT event_id, user_id, ts, event_type,
       |    '0xa' || CAST(user_id AS VARCHAR) AS addr,
       |    md5(CAST(event_id AS VARCHAR)) AS tx_hash,
       |    (CAST(floor(value*100) AS HUGEINT) + 10) * 1000000000000000 AS reserve_total,
       |    (CAST(user_id AS HUGEINT) + 1) * 1000000000000 AS amount,
       |    CASE WHEN user_id % 10 = 0 THEN 0
       |         ELSE CAST(event_id % 1000 AS HUGEINT) * 1000000000 END AS commission,
       |    CASE WHEN user_id % 10 = 0 THEN 0
       |         ELSE CAST(user_id % 100 AS HUGEINT) * 1000000000 END AS btc_markup,
       |    CAST(event_id % 7 AS HUGEINT) * 1000000000 AS moc_commission_value,
       |    CAST(user_id % 3 AS HUGEINT) * 1000000000 AS moc_markup,
       |    (CAST(user_id % 10 AS HUGEINT) + 10) * $Wei18 AS reserve_price,
       |    (CAST(user_id % 5 AS HUGEINT) + 5) * $Wei18 AS moc_price,
       |    CAST(event_id % 1000 AS HUGEINT) + 21000 AS gas_used,
       |    CAST(user_id AS HUGEINT) + 1000000000 AS gas_price,
       |    CAST(event_id % 500 AS HUGEINT) * 1000000000 AS interests
       |  FROM events)""".stripMargin

  private val ExchangeOps = Seq(
    // (op code, event, token, sign) — totals per the cited rbtc_total lines
    (0, "RiskProMint", "RISKPRO", true),
    (1, "RiskProRedeem", "RISKPRO", false),
    (2, "RiskProxMint", "RISKPROX", true),
    (3, "RiskProxRedeem", "RISKPROX", false),
    (4, "StableTokenMint", "STABLE", true),
    (5, "StableTokenRedeem", "STABLE", false),
    (6, "FreeStableTokenRedeem", "STABLE", false))

  val queries: Seq[Q] = Seq(

    Q(
      "tx_exchange_ops", {
        val evCase = ExchangeOps.map { case (i, n, _, _) => s"WHEN $i THEN '$n'" }
          .mkString("CASE op ", " ", " END")
        val tokCase = ExchangeOps.map { case (i, _, t, _) => s"WHEN $i THEN '$t'" }
          .mkString("CASE op ", " ", " END")
        s"""WITH $BaseCte,
           |ops AS (
           |  SELECT *, event_id % 7 AS op,
           |    commission + btc_markup AS rbtc_comm,
           |    moc_commission_value + moc_markup AS moc_comm,
           |    gas_used * gas_price AS gas_fee
           |  FROM base),
           |rows_out AS (
           |  -- prices are exact k×10^18, so X*price//10^18 = X*k: stays in
           |  -- HUGEINT range (the raw 10^38-scale product would overflow)
           |  SELECT event_id, $evCase AS event, addr AS address, $tokCase AS token_involved,
           |    CAST(CASE WHEN op = 4 THEN reserve_total ELSE amount END AS VARCHAR) AS amount_wei,
           |    CAST(reserve_total AS VARCHAR) AS rbtc_amount,
           |    CAST(reserve_total * (reserve_price // $Wei18) AS VARCHAR) AS usd_amount,
           |    CAST(rbtc_comm AS VARCHAR) AS rbtc_commission,
           |    CAST(CASE WHEN rbtc_comm > 0 THEN rbtc_comm * (reserve_price // $Wei18)
           |              ELSE moc_comm * (moc_price // $Wei18) END AS VARCHAR) AS usd_commission,
           |    CAST(gas_fee AS VARCHAR) AS gas_fee_rbtc,
           |    CAST(CASE op
           |      WHEN 0 THEN reserve_total + commission + gas_fee
           |      WHEN 1 THEN reserve_total - gas_fee
           |      WHEN 2 THEN reserve_total + commission + interests + gas_fee
           |      WHEN 3 THEN reserve_total + interests - gas_fee
           |      WHEN 4 THEN reserve_total + commission + gas_fee
           |      WHEN 5 THEN reserve_total - gas_fee
           |      ELSE reserve_total - commission - gas_fee END AS VARCHAR) AS rbtc_total,
           |    CAST((CASE op
           |      WHEN 0 THEN reserve_total + commission + gas_fee
           |      WHEN 1 THEN reserve_total - gas_fee
           |      WHEN 2 THEN reserve_total + commission + interests + gas_fee
           |      WHEN 3 THEN reserve_total + interests - gas_fee
           |      WHEN 4 THEN reserve_total + commission + gas_fee
           |      WHEN 5 THEN reserve_total - gas_fee
           |      ELSE reserve_total - commission - gas_fee END) * (reserve_price // $Wei18)
           |      AS VARCHAR) AS usd_total,
           |    op IN (0, 2, 4) AS is_positive
           |  FROM ops)
           |SELECT * FROM rows_out ORDER BY event_id""".stripMargin
      }) { (s, d) =>
      val b = base(s, d).withColumn("op", col("event_id") % 7)
      val (rbtcCommE, _, usdCommE) = Wei.commissions(
        col("commission"), lit(null).cast(DecimalType(38, 0)), col("btc_markup"),
        col("moc_commission_value"), col("moc_markup"),
        col("reserve_price"), col("moc_price"))
      val gasFeeE = Wei.gasFee(col("gas_used"), col("gas_price"))
      // per-op total (the cited rbtc_total lines); mint/redeem shapes map
      // onto the two Wei total helpers
      val mintT = (i: Column, c: Column) => Wei.mintTotalWei(
        col("reserve_total"), c, i, gasFeeE)
      val redeemT = (i: Column, c: Column) => Wei.redeemTotalWei(
        col("reserve_total"), c, i, gasFeeE)
      val zero = lit(0).cast(DecimalType(38, 0))
      val nullI = lit(null).cast(DecimalType(38, 0))
      val totalWei =
        when(col("op") === 0, mintT(nullI, col("commission")))
          .when(col("op") === 1, redeemT(nullI, zero))
          .when(col("op") === 2, mintT(col("interests"), col("commission")))
          .when(col("op") === 3, redeemT(col("interests"), zero))
          .when(col("op") === 4, mintT(nullI, col("commission")))
          .when(col("op") === 5, redeemT(nullI, zero))
          .otherwise(redeemT(nullI, col("commission")))
      val evCase = ExchangeOps.tail.foldLeft(
        when(col("op") === ExchangeOps.head._1, ExchangeOps.head._2)) {
        case (acc, (i, n, _, _)) => acc.when(col("op") === i, n)
      }
      val tokCase = ExchangeOps.tail.foldLeft(
        when(col("op") === ExchangeOps.head._1, ExchangeOps.head._3)) {
        case (acc, (i, _, t, _)) => acc.when(col("op") === i, t)
      }
      b.select(
          col("event_id"), evCase.as("event"), col("addr").as("address"),
          tokCase.as("token_involved"),
          when(col("op") === 4, col("reserve_total")).otherwise(col("amount"))
            .cast(StringType).as("amount_wei"),
          col("reserve_total").cast(StringType).as("rbtc_amount"),
          Wei.toWeiStr(Wei.usdAmount(col("reserve_total"), col("reserve_price")))
            .as("usd_amount"),
          Wei.toWeiStr(rbtcCommE).as("rbtc_commission"),
          Wei.toWeiStr(usdCommE).as("usd_commission"),
          Wei.toWeiStr(gasFeeE).as("gas_fee_rbtc"),
          totalWei.cast(StringType).as("rbtc_total"),
          Wei.toWeiStr(Wei.usdTotal(totalWei, col("reserve_price"))).as("usd_total"),
          col("op").isin(0, 2, 4).as("is_positive"))
        .orderBy(col("event_id"))
    }.copy(bench = true),

    // ── Notification collection: 8 event shapes keyed by
    // (transactionHash, logIndex, event) (mongo_manager.py:172-174),
    // payload rendered into four generic string slots.
    Q(
      "tx_notifications",
      s"""WITH $BaseCte,
         |n AS (SELECT *, event_id % 8 AS op FROM base),
         |rows_out AS (
         |  SELECT event_id, tx_hash, event_id % 3 AS log_index,
         |    CASE op
         |      WHEN 0 THEN 'SettlementStarted'
         |      WHEN 1 THEN 'SettlementRedeemStableToken'
         |      WHEN 2 THEN 'InrateDailyPay'
         |      WHEN 3 THEN 'RiskProHoldersInterestPay'
         |      WHEN 4 THEN 'BucketLiquidation'
         |      WHEN 5 THEN 'ContractLiquidated'
         |      WHEN 6 THEN 'StateTransition'
         |      ELSE 'SettlementCompleted' END AS event,
         |    CASE op
         |      WHEN 0 THEN CAST(user_id % 50 AS VARCHAR)        -- docRedeemCount
         |      WHEN 1 THEN CAST(user_id % 50 AS VARCHAR)        -- queueSize
         |      WHEN 2 THEN CAST(amount AS VARCHAR)              -- amount
         |      WHEN 3 THEN CAST(amount AS VARCHAR)              -- amount
         |      WHEN 4 THEN 'X2'                                 -- bucket
         |      WHEN 5 THEN 'MoC'                                -- contract
         |      WHEN 6 THEN CASE user_id % 4 WHEN 0 THEN 'Liquidated'
         |        WHEN 1 THEN 'BProDiscount' WHEN 2 THEN 'BelowCobj'
         |        ELSE 'AboveCobj' END                           -- d_states map
         |      ELSE CAST(commission AS VARCHAR) END AS f1,      -- commissionsPayed
         |    CASE op
         |      WHEN 0 THEN CAST(user_id % 20 AS VARCHAR)        -- deleveragingCount
         |      WHEN 1 THEN CAST(commission AS VARCHAR)          -- accumCommissions
         |      WHEN 2 THEN CAST(event_id % 30 AS VARCHAR)       -- daysToSettlement
         |      WHEN 3 THEN CAST(reserve_total AS VARCHAR)       -- nBtcBucketC0BeforePay
         |      ELSE NULL END AS f2,
         |    CASE op
         |      WHEN 0 THEN CAST(reserve_price AS VARCHAR)       -- btcPrice
         |      WHEN 1 THEN CAST(reserve_price AS VARCHAR)       -- reservePrice
         |      ELSE NULL END AS f3
         |  FROM n)
         |SELECT * FROM rows_out ORDER BY event_id""".stripMargin) { (s, d) =>
      val n = base(s, d).withColumn("op", col("event_id") % 8)
      val dStates = when(col("user_id") % 4 === 0, "Liquidated")
        .when(col("user_id") % 4 === 1, "BProDiscount")
        .when(col("user_id") % 4 === 2, "BelowCobj")
        .otherwise("AboveCobj")
      n.select(
          col("event_id"), col("tx_hash"), (col("event_id") % 3).as("log_index"),
          when(col("op") === 0, "SettlementStarted")
            .when(col("op") === 1, "SettlementRedeemStableToken")
            .when(col("op") === 2, "InrateDailyPay")
            .when(col("op") === 3, "RiskProHoldersInterestPay")
            .when(col("op") === 4, "BucketLiquidation")
            .when(col("op") === 5, "ContractLiquidated")
            .when(col("op") === 6, "StateTransition")
            .otherwise("SettlementCompleted").as("event"),
          when(col("op") === 0, (col("user_id") % 50).cast(StringType))
            .when(col("op") === 1, (col("user_id") % 50).cast(StringType))
            .when(col("op") === 2, col("amount").cast(StringType))
            .when(col("op") === 3, col("amount").cast(StringType))
            .when(col("op") === 4, lit("X2"))
            .when(col("op") === 5, lit("MoC"))
            .when(col("op") === 6, dStates)
            .otherwise(col("commission").cast(StringType)).as("f1"),
          when(col("op") === 0, (col("user_id") % 20).cast(StringType))
            .when(col("op") === 1, col("commission").cast(StringType))
            .when(col("op") === 2, (col("event_id") % 30).cast(StringType))
            .when(col("op") === 3, col("reserve_total").cast(StringType))
            .otherwise(lit(null).cast(StringType)).as("f2"),
          when(col("op").isin(0, 1), col("reserve_price").cast(StringType))
            .otherwise(lit(null).cast(StringType)).as("f3"))
        .orderBy(col("event_id"))
    },

    // ── Settlement redeem-request fold: alters accumulate ±delta per
    // redeemer, processed requests drain, and the completed settlement's
    // retention delete drops every alter at-or-below its height.
    Q(
      "tx_redeem_lifecycle",
      s"""WITH $BaseCte,
         |cut AS (SELECT max(event_id) - 5000 AS h FROM base),
         |alters AS (
         |  SELECT addr AS redeemer, event_id,
         |    CASE WHEN event_id % 3 = 0 THEN -amount ELSE amount END AS signed_delta
         |  FROM base WHERE event_type = 'click'),
         |alive AS (SELECT * FROM alters, cut WHERE event_id > cut.h),
         |processed AS (
         |  SELECT addr AS redeemer, amount, commission
         |  FROM base WHERE event_type = 'purchase'),
         |folded AS (
         |  SELECT redeemer,
         |    CAST(sum(signed_delta) AS VARCHAR) AS queued_wei,
         |    count(*) AS n_alive
         |  FROM alive GROUP BY redeemer),
         |drains AS (
         |  SELECT redeemer, CAST(sum(amount) AS VARCHAR) AS drained_wei,
         |    CAST(sum(commission) AS VARCHAR) AS commission_wei, count(*) AS n_processed
         |  FROM processed GROUP BY redeemer)
         |SELECT f.redeemer, f.queued_wei, f.n_alive,
         |  d.drained_wei, d.commission_wei, coalesce(d.n_processed, 0) AS n_processed
         |FROM folded f LEFT JOIN drains d USING (redeemer)
         |ORDER BY f.redeemer""".stripMargin) { (s, d) =>
      val b = base(s, d)
      // scalar retention cut, broadcast (the 31-day/height retention of
      // mocsettlement.py:416-429 as a height predicate)
      val cut = b.agg((max(col("event_id")) - 5000).as("h"))
      val alters = b.filter(col("event_type") === "click")
        .select(col("addr").as("redeemer"), col("event_id"),
          when(col("event_id") % 3 === 0, -col("amount")).otherwise(col("amount"))
            .as("signed_delta"))
      val alive = alters.crossJoin(broadcast(cut)).filter(col("event_id") > col("h"))
      val folded = alive.groupBy(col("redeemer")).agg(
        sum(col("signed_delta")).cast(StringType).as("queued_wei"),
        count(lit(1)).as("n_alive"))
      val drains = b.filter(col("event_type") === "purchase")
        .groupBy(col("addr").as("redeemer")).agg(
          sum(col("amount")).cast(StringType).as("drained_wei"),
          sum(col("commission")).cast(StringType).as("commission_wei"),
          count(lit(1)).as("n_processed"))
      folded.join(drains, Seq("redeemer"), "left")
        .select(col("redeemer"), col("queued_wei"), col("n_alive"),
          col("drained_wei"), col("commission_wei"),
          coalesce(col("n_processed"), lit(0L)).as("n_processed"))
        .orderBy(col("redeemer"))
    },

    // ── FastBtcBridge PEG_OUT lifecycle: inserts then conditional status
    // patches (updates never create rows — inner-join semantics), folded
    // to the latest status per transferId.
    Q(
      "tx_fastbtc_status",
      s"""WITH $BaseCte,
         |transfers AS (
         |  SELECT md5('t' || CAST(user_id AS VARCHAR)) AS transfer_id,
         |    min(event_id) AS created_event,
         |    min_by(addr, event_id) AS rsk_address,
         |    min_by(CAST(amount // 10000000000 AS BIGINT), event_id) AS amount_satoshi
         |  FROM base WHERE event_type = 'signup' GROUP BY 1),
         |updates AS (
         |  SELECT md5('t' || CAST(user_id AS VARCHAR)) AS transfer_id,
         |    event_id, CAST(1 + event_id % 4 AS INTEGER) AS new_status
         |  FROM base WHERE event_type = 'error'),
         |latest AS (
         |  SELECT transfer_id, max_by(new_status, event_id) AS last_status
         |  FROM updates GROUP BY transfer_id)
         |SELECT t.transfer_id, 'PEG_OUT' AS type, t.rsk_address, t.amount_satoshi,
         |  coalesce(l.last_status, 0) AS status
         |FROM transfers t LEFT JOIN latest l USING (transfer_id)
         |ORDER BY t.transfer_id""".stripMargin) { (s, d) =>
      val b = base(s, d)
      val wFirst = Window.partitionBy(col("transfer_id")).orderBy(col("event_id"))
      val transfers = b.filter(col("event_type") === "signup")
        .withColumn("transfer_id", md5(concat(lit("t"), col("user_id").cast(StringType))))
        .withColumn("rn", row_number().over(wFirst))
        .filter(col("rn") === 1)
        .select(col("transfer_id"), col("addr").as("rsk_address"),
          expr("CAST(CAST(amount AS BIGINT) div 10000000000 AS BIGINT)").as("amount_satoshi"))
      val updates = b.filter(col("event_type") === "error")
        .select(md5(concat(lit("t"), col("user_id").cast(StringType))).as("transfer_id"),
          col("event_id"), (lit(1) + col("event_id") % 4).cast(IntegerType).as("new_status"))
      val latest = updates.groupBy(col("transfer_id"))
        .agg(max_by(col("new_status"), col("event_id")).as("last_status"))
      transfers.join(latest, Seq("transfer_id"), "left")
        .select(col("transfer_id"), lit("PEG_OUT").as("type"), col("rsk_address"),
          col("amount_satoshi"), coalesce(col("last_status"), lit(0)).as("status"))
        .orderBy(col("transfer_id"))
    })
}
