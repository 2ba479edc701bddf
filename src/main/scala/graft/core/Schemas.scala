package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The document-store catalog — the reference's 16 MongoDB collections as
  * explicit Spark schemas, one [[Collection]] per `collection_*` factory in
  * mongo_manager.py:26-275, with the natural key lifted from each unique
  * index (`create_index(..., unique=True)`). Field shapes come from the
  * writer that assembles each document (citations per collection); wei
  * quantities are STRINGS (every writer renders `str(...)` — exact decimal
  * strings survive any JSON/BSON boundary), block heights are longs,
  * timestamps are timestamps.
  *
  * Event payload shapes (the 21 decoded log payloads) live in
  * [[graft.plans.LogSchemaRegistry]]; [[Schemas.payloadOf]] exposes them
  * here so the catalog is one-stop. [[Schemas.conform]] is the sink-side
  * gate: align a derivation's output to the declared collection schema
  * (order + types), failing loudly on a missing field instead of writing a
  * malformed document.
  */
final case class Collection(name: String, keys: Seq[String], schema: StructType,
    required: Seq[String] = Nil) {
  require(keys.forall(schema.fieldNames.contains),
    s"collection $name: key not in schema")
  require(required.forall(schema.fieldNames.contains),
    s"collection $name: required field not in schema")
  /** fields a document may not omit: the natural key plus any field the
    * store's validator demands (only raw_transactions declares one). */
  val requiredFields: Seq[String] = (keys ++ required).distinct
}

object Schemas {
  private def f(n: String, t: DataType) = StructField(n, t)
  private val S = StringType
  private val L = LongType
  private val B = BooleanType
  private val TS = TimestampType

  /** moc_state.py:140-220 — the multicall snapshot document (wei fields as
    * strings; `commissionRatesTypes` is the 12-slot fee map, :205). */
  val mocState: Collection = Collection("MocState", Seq("blockHeight"), StructType(Seq(
    f("blockHeight", L), f("createdAt", TS),
    f("bitcoinPrice", S), f("mocPrice", S),
    f("bproAvailableToRedeem", S), f("bprox2AvailableToMint", S),
    f("docAvailableToMint", S), f("docAvailableToRedeem", S),
    f("b0Leverage", S), f("b0TargetCoverage", S), f("x2Leverage", S),
    f("totalBTCAmount", S), f("bitcoinMovingAverage", S),
    f("b0BTCInrateBag", S), f("b0BTCAmount", S), f("b0DocAmount", S),
    f("b0BproAmount", S), f("x2BTCAmount", S), f("x2DocAmount", S),
    f("x2BproAmount", S), f("globalCoverage", S),
    f("reservePrecision", S), f("mocPrecision", S), f("x2Coverage", S),
    f("bproPriceInRbtc", S), f("bproPriceInUsd", S), f("bproDiscountRate", S),
    f("maxBproWithDiscount", S), f("bproDiscountPrice", S),
    f("bprox2PriceInRbtc", S), f("bprox2PriceInBpro", S),
    f("bprox2PriceInUsd", S), f("spotInrate", S),
    f("commissionRatesTypes", MapType(S, S)),
    f("dayBlockSpan", L), f("blockSpan", L), f("blocksToSettlement", L),
    f("state", L), f("lastPriceUpdateHeight", L),
    f("paused", B), f("liquidationEnabled", B), f("protected", S))))

  /** mongo_manager.py:38-49 — same shape, retained per height. */
  val mocStateHistory: Collection =
    Collection("MocState_history", Seq("blockHeight"), mocState.schema)

  /** scan_moc_state_status.py:193-194 — per-height scan status heartbeat. */
  val mocStateStatus: Collection = Collection("MocState_status",
    Seq("blockHeight"), StructType(Seq(
      f("blockHeight", L), f("createdAt", TS))))

  /** moc_prices.py:55-67 (unique asc index mongo_manager.py:64-74). */
  val price: Collection = Collection("Price", Seq("blockHeight"), StructType(Seq(
    f("blockHeight", L), f("createdAt", TS),
    f("bitcoinPrice", S), f("bproPriceInRbtc", S), f("bproPriceInUsd", S),
    f("bproDiscountPrice", S), f("bprox2PriceInRbtc", S),
    f("bprox2PriceInBpro", S), f("reservePrecision", S),
    f("bprox2PriceInUsd", S), f("mocPrice", S))))

  /** moc_balances.py:67-105 — per-account balance snapshot, keyed by the
    * update filter `{"address": account}` (moc_balances.py:157-165). */
  val userState: Collection = Collection("UserState", Seq("address"), StructType(Seq(
    f("address", S), f("blockHeight", L), f("createdAt", TS),
    f("mocBalance", S), f("mocAllowance", S), f("docBalance", S),
    f("bproBalance", S), f("rbtcBalance", S), f("docToRedeem", S),
    f("bprox2Balance", S), f("potentialBprox2MaxInterest", S),
    f("bProHoldIncentive", S),
    f("estimateGasMintBpro", S), f("estimateGasMintDoc", S),
    f("estimateGasMintBprox2", S),
    f("spendableBalance", S), f("reserveAllowance", S), f("bproMoCBalance", S))))

  /** moc_balances.py:174-188 — the dirty-set changelog (T6): one touched
    * account per row, drained by scan_moc_user.py:44-70. */
  val userStateUpdate: Collection = Collection("UserState_update",
    Seq("account"), StructType(Seq(
      f("account", S), f("block_height", L))))

  /** moc_balances.py:146-155 — webapp user profile, insert-if-absent. */
  val users: Collection = Collection("users", Seq("username"), StructType(Seq(
    f("username", S), f("prefLanguage", S), f("createdAt", TS),
    f("lastNotificationCheckAt", TS), f("showTermsAndConditions", B),
    f("showTutorialNoMore", B), f("createdBlockHeight", L))))

  /** mocinrate.py:92-102 RiskProHoldersInterestPay payout ledger. */
  val bitproHoldersInterest: Collection = Collection("BitProHoldersInterest",
    Seq("blockHeight"), StructType(Seq(
      f("blockHeight", L), f("amount", S), f("nBtcBucketC0BeforePay", S),
      f("createdAt", TS))))

  /** mocsettlement.py:36-45 settlement lifecycle doc (unique on
    * startBlockNumber, mongo_manager.py:125-136; inProcess flips on
    * SettlementCompleted :416-429). */
  val settlementState: Collection = Collection("SettlementState",
    Seq("startBlockNumber"), StructType(Seq(
      f("startBlockNumber", L), f("inProcess", B),
      f("docRedeemCount", L), f("deleveragingCount", L),
      f("btcxPrice", S), f("btcPrice", S),
      f("processedAt", TS), f("createdAt", TS))))

  /** mocinrate.py:42-61 InrateDailyPay income ledger. */
  val inRateIncome: Collection = Collection("InRateIncome",
    Seq("blockHeight"), StructType(Seq(
      f("blockHeight", L), f("amount", S), f("daysToSettlement", S),
      f("nReserveBucketC0", S), f("createdAt", TS))))

  /** the central derivation target — one row per (tx, address, event) leg
    * (unique compound index mongo_manager.py:150-162); superset of every
    * events/ writer's fields (mocexchange.py:42-91 exchange ops,
    * token_riskpro.py:54-122 transfer legs, mocsettlement.py:84-105
    * redeem requests). Optional columns are null for events that don't
    * carry them — the same heterogeneous-document shape the writers
    * produce. */
  val transaction: Collection = Collection("Transaction",
    Seq("transactionHash", "address", "event"), StructType(Seq(
      f("transactionHash", S), f("address", S), f("event", S),
      f("blockNumber", L), f("tokenInvolved", S),
      f("amount", S), f("userAmount", S),
      f("RBTCAmount", S), f("USDAmount", S),
      f("rbtcCommission", S), f("USDCommission", S),
      f("mocCommissionValue", S), f("mocPrice", S), f("reservePrice", S),
      f("gasFeeRBTC", S), f("gasFeeUSD", S),
      f("RBTCTotal", S), f("USDTotal", S),
      f("leverage", S), f("interests", S), f("bucket", S),
      f("isPositive", B), f("status", S), f("confirmationTime", TS),
      f("confirmingPercent", L), f("processLogs", B),
      f("createdAt", TS), f("lastUpdatedAt", TS))))

  /** notification feed keyed (tx, logIndex, event)
    * (mongo_manager.py:164-176); payload rides in generic string slots —
    * moc.py:101-106 bucket liquidation, mocinrate.py:26-32 daily pay,
    * mocsettlement.py:25-60 settlement markers, mocstate.py:11-44 state
    * transitions. */
  val notification: Collection = Collection("Notification",
    Seq("transactionHash", "logIndex", "event"), StructType(Seq(
      f("transactionHash", S), f("logIndex", L), f("event", S),
      f("timestamp", TS), f("processLogs", B),
      f("f1", S), f("f2", S), f("f3", S))))

  /** scan_raw_txs.py:58-60 + scan_events_txs checkpoint cursor — the
    * single-doc scan checkpoint (S12; update_one({}) → one row). */
  val mocIndexer: Collection = Collection("moc_indexer",
    Seq.empty, StructType(Seq(
      f("processed", B), f("block_number", L), f("block_ts", TS),
      f("last_raw_tx_block", L), f("last_moc_status_block", L),
      f("updatedAt", TS))))

  /** same shape, appended per run for audit. */
  val mocIndexerHistory: Collection =
    Collection("moc_indexer_history", Seq.empty, mocIndexer.schema)

  /** the ONLY collection with a server-side validator
    * (mongo_manager.py:200-255 $jsonSchema, required [hash, blockNumber])
    * — field-for-field from the bsonType map; `logs` is the receipt's log
    * array as a JSON string (:46). Non-unique index on blockNumber. */
  val rawTransactions: Collection = Collection("raw_transactions",
    Seq("hash"), StructType(Seq(
      f("hash", S), f("blockNumber", L), f("from", S), f("to", S),
      f("value", S), f("gas", L), f("gasPrice", S), f("input", S),
      f("receipt", B), f("processed", B), f("gas_used", L),
      f("confirmations", L), f("timestamp", TS), f("logs", S),
      f("status", S), f("createdAt", TS), f("lastUpdatedAt", TS))),
    required = Seq("hash", "blockNumber"))

  /** fastbtcbridge.py:21-34 PEG_OUT transfers, unique on transferId
    * (mongo_manager.py:265-276); status patched in place (:56-72). */
  val fastBtcBridge: Collection = Collection("FastBtcBridge",
    Seq("transferId"), StructType(Seq(
      f("transferId", S), f("transactionHash", S),
      f("transactionHashLastUpdated", S), f("blockNumber", L),
      f("type", S), f("btcAddress", S), f("nonce", L),
      f("amountSatoshi", S), f("feeSatoshi", S), f("rskAddress", S),
      f("status", L), f("timestamp", TS), f("updated", TS),
      f("processLogs", B))))

  /** every collection the reference creates — mongo_manager.py top-down. */
  val all: Seq[Collection] = Seq(
    mocState, mocStateHistory, mocStateStatus, price,
    userState, userStateUpdate, users, bitproHoldersInterest,
    settlementState, inRateIncome, transaction, notification,
    mocIndexer, mocIndexerHistory, rawTransactions, fastBtcBridge)

  val byName: Map[String, Collection] = all.map(c => c.name -> c).toMap

  /** decoded log payload schema for one of the 22 event types the
    * reference dispatches to a real handler (scan_events_txs.py:50-110)
    * — TOTAL over the dispatch targets, including the zero-payload
    * ContractLiquidated (empty struct). An unregistered name is a caller
    * bug and raises a typed error naming the registry, never a bare
    * `NoSuchElementException` from a Map lookup. */
  def payloadOf(event: String): StructType =
    graft.plans.LogSchemaRegistry.byName.getOrElse(event,
      throw new IllegalArgumentException(
        s"no payload schema for event '$event': not a LogSchemaRegistry " +
          "dispatch target (scan_events_txs.py:50-110)")).structType

  /** Sink-side schema gate: project `df` onto `c.schema` — declared column
    * order, casts where the runtime type differs, null literals are NOT
    * invented: a missing field is an error (a malformed document must die
    * in the pipeline, not in the store). Extra columns are dropped. */
  def conform(df: DataFrame, c: Collection): DataFrame = {
    val have = df.columns.toSet
    val missing = c.schema.fieldNames.filterNot(have)
    require(missing.isEmpty,
      s"cannot conform to ${c.name}: missing ${missing.mkString(", ")}")
    df.select(c.schema.fields.toIndexedSeq.map(fd =>
      col(s"`${fd.name}`").cast(fd.dataType).as(fd.name)): _*)
  }

  /** Mongo-faithful variant: documents are SPARSE — each reference writer
    * sets only its own fields (a RiskProMint row never carries `bucket`,
    * a Transfer leg never carries commissions). A missing OPTIONAL field
    * becomes a typed null; a missing natural-key / validator-required
    * field is still an error. This is the write-path gate for per-event
    * writers; [[conform]] stays the strict full-document gate. */
  def conformSparse(df: DataFrame, c: Collection): DataFrame = {
    val have = df.columns.toSet
    val missingReq = c.requiredFields.filterNot(have)
    require(missingReq.isEmpty,
      s"cannot conform to ${c.name}: missing required ${missingReq.mkString(", ")}")
    df.select(c.schema.fields.toIndexedSeq.map { fd =>
      val base = if (have(fd.name)) col(s"`${fd.name}`")
        else org.apache.spark.sql.functions.lit(null)
      base.cast(fd.dataType).as(fd.name)
    }: _*)
  }
}
