package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DecodeLogExpr, LogSchemaRegistry}

/** Typed log decode: registry-derived topic0 dispatch, indexed vs data
  * fields, dynamic string tails, and cast-style leniency on malformed
  * input (scan_events_txs.py:144 _decode_logs semantics).
  */
class AbiDecodeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def decodeLog(ev: String, topics: Column, data: Column): Column =
    toCol(DecodeLogExpr(ev, toExpr(topics), toExpr(data)))

  private def pad(hexDigits: String): String = ("0" * (64 - hexDigits.length)) + hexDigits

  test("registry derives the real ERC-20 Transfer topic0") {
    assert(LogSchemaRegistry.byName("Transfer").topic0 ===
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    // every registered event has a distinct topic0 (dispatch is injective)
    val all = LogSchemaRegistry.events.map(_.topic0)
    assert(all.distinct.length === all.length)
  }

  test("indexed + static fields decode (Transfer)") {
    val t0 = "0x" + LogSchemaRegistry.byName("Transfer").topic0
    val row = Seq((Seq(t0, pad("aa" * 20), pad("bb" * 20)), pad("2a")))
      .toDF("topics", "data")
      .select(decodeLog("Transfer", col("topics"), col("data")).as("d"))
      .select(col("d.from"), col("d.to"), col("d.value").cast("string"))
      .head()
    assert(row.getString(0) === "0x" + "aa" * 20)
    assert(row.getString(1) === "0x" + "bb" * 20)
    assert(row.getString(2) === "42")
  }

  test("dynamic string + bytes32 + bool decode (NewBitcoinTransfer, RedeemRequestAlter)") {
    // NewBitcoinTransfer(bytes32 idx transferId, string btcAddress,
    //   uint256 nonce, uint256 amountSatoshi, uint256 feeSatoshi, address idx rskAddress)
    val t0 = "0x" + LogSchemaRegistry.byName("NewBitcoinTransfer").topic0
    val btc = "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
    val btcHex = btc.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    // heads: btcAddress offset (4 static slots * 32 = 0x80), nonce, amount, fee
    val data = pad("80") + pad("7") + pad("f4240") + pad("3e8") +
      pad(btc.length.toHexString) + btcHex + "0" * (64 - btcHex.length % 64)
    val row = Seq((Seq(t0, pad("cd" * 32), pad("ee" * 20)), data))
      .toDF("topics", "data")
      .select(decodeLog("NewBitcoinTransfer", col("topics"), col("data")).as("d"))
      .select(col("d.transferId"), col("d.btcAddress"),
        col("d.nonce").cast("string"), col("d.amountSatoshi").cast("string"),
        col("d.rskAddress"))
      .head()
    assert(row.getString(0) === "0x" + "cd" * 32)
    assert(row.getString(1) === btc)
    assert(row.getString(2) === "7")
    assert(row.getString(3) === "1000000")
    assert(row.getString(4) === "0x" + "ee" * 20)

    val t0b = "0x" + LogSchemaRegistry.byName("RedeemRequestAlter").topic0
    val alter = Seq((Seq(t0b, pad("11" * 20)), pad("1") + pad("64")))
      .toDF("topics", "data")
      .select(decodeLog("RedeemRequestAlter", col("topics"), col("data")).as("d"))
      .select(col("d.redeemer"), col("d.isAddition"), col("d.delta").cast("string"))
      .head()
    assert(alter.getString(0) === "0x" + "11" * 20)
    assert(alter.getBoolean(1) === true)
    assert(alter.getString(2) === "100")
  }

  test("wrong topic0, short data, and bad hex all yield a null struct") {
    val t0 = "0x" + LogSchemaRegistry.byName("Transfer").topic0
    val rows = Seq(
      (Seq("0x" + "00" * 32, pad("aa" * 20), pad("bb" * 20)), pad("2a")), // wrong topic0
      (Seq(t0, pad("aa" * 20), pad("bb" * 20)), "beef"),                  // short data
      (Seq(t0, pad("aa" * 20), pad("bb" * 20)), "z" * 64),                // bad hex
      (Seq(t0), pad("2a")))                                               // missing topics
      .toDF("topics", "data")
      .select(decodeLog("Transfer", col("topics"), col("data")).as("d"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("zero-payload ContractLiquidated: topic0 dispatch on an empty struct") {
    // the 22nd dispatch target (moc.py:125-232): signature has NO fields,
    // so topic0 = keccak("ContractLiquidated()") and the decode's only
    // job is the dispatch verdict — non-null empty struct on a matching
    // topic0, null on anything else
    val spec = LogSchemaRegistry.byName("ContractLiquidated")
    assert(spec.signature === "ContractLiquidated()")
    assert(spec.structType.isEmpty)
    val t0 = "0x" + spec.topic0
    val rows = Seq(
      (Seq(t0), ""),                 // match: empty data
      (Seq("0x" + "00" * 32), ""))   // wrong topic0
      .toDF("topics", "data")
      .select(decodeLog("ContractLiquidated", col("topics"), col("data")).as("d"))
      .collect()
    assert(!rows(0).isNullAt(0), "matching topic0 must decode (empty struct)")
    assert(rows(1).isNullAt(0), "wrong topic0 must null")
  }

  test("uint256 beyond 38 decimal digits nulls the field, not the row") {
    val t0 = "0x" + LogSchemaRegistry.byName("Transfer").topic0
    val row = Seq((Seq(t0, pad("aa" * 20), pad("bb" * 20)), "f" * 64))
      .toDF("topics", "data")
      .select(decodeLog("Transfer", col("topics"), col("data")).as("d"))
      .select(col("d.from"), col("d.value"))
      .head()
    assert(row.getString(0) === "0x" + "aa" * 20)
    assert(row.isNullAt(1), "2^256-1 exceeds Decimal(38,0) — must null the field")
  }

  test("decode_log is callable from SQL") {
    graft.plans.GraftFunctions.register(spark)
    val t0 = "0x" + LogSchemaRegistry.byName("StateTransition").topic0
    val out = spark.sql(
      s"SELECT decode_log('StateTransition', array('$t0'), '${pad("3")}').newState AS s")
      .head().getDecimal(0)
    assert(out.longValueExact() === 3L)
  }
}
