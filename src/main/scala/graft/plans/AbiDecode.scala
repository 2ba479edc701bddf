package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Keccak256

/** Typed EVM log decoding — the full X1 (SURVEY.md §2.10): the reference's
  * `_decode_logs` (scan_events_txs.py:144) dispatches keccak-topic0 to a
  * per-event typed payload; here the dispatch table is
  * [[LogSchemaRegistry]] and the decode is a codegen'd Catalyst expression
  * ([[DecodeLogExpr]]) returning a typed struct.
  *
  * `topic0 = keccak256(signature)` is DERIVED (graft.functions.Keccak256,
  * spec-tested against the public ERC-20 Transfer hash), not hard-coded.
  * Token-contract signatures (Transfer/Approval) are the real ERC-20 ABI;
  * the MoC-specific payload shapes are fixture-pinned from what each
  * reference handler reads (citations on every entry).
  *
  * ABI layout decoded: indexed fields come from `topics[1..]` in field
  * order; static non-indexed fields are consecutive 32-byte words of
  * `data`; a dynamic `string` head word holds the byte offset of its
  * length-prefixed tail. Malformed input (wrong topic0, short data, bad
  * hex) yields a null struct — cast-style leniency, never an exception.
  */
sealed trait AbiType { def abiName: String; def sparkType: DataType }
case object AbiAddress extends AbiType { val abiName = "address"; val sparkType: DataType = StringType }
case object AbiUint extends AbiType { val abiName = "uint256"; val sparkType: DataType = DecimalType(38, 0) }
case object AbiBytes32 extends AbiType { val abiName = "bytes32"; val sparkType: DataType = StringType }
case object AbiBool extends AbiType { val abiName = "bool"; val sparkType: DataType = BooleanType }
case object AbiString extends AbiType { val abiName = "string"; val sparkType: DataType = StringType }

case class AbiField(name: String, tpe: AbiType, indexed: Boolean = false)

case class EventAbi(name: String, fields: Seq[AbiField]) {
  val signature: String = s"$name(${fields.map(_.tpe.abiName).mkString(",")})"
  /** lowercase, no 0x — the comparison form */
  val topic0: String = Keccak256.hex(signature)
  def structType: StructType =
    StructType(fields.map(f => StructField(f.name, f.tpe.sparkType)))
}

/** topic0 → payload schema for every event the reference DISPATCHES to a
  * real handler (scan_events_txs.py:50-110 builds the map; 22 entries
  * including the zero-payload ContractLiquidated and BucketLiquidation's
  * bucket-only shape, so [[graft.core.Schemas.payloadOf]] is total over
  * the dispatch targets). The reference additionally REGISTERS three
  * dispatch rows routed to the empty handler — recognized, silently
  * skipped, never decoded — carried here as [[ignoredDispatch]] so the
  * unknown-event warn path has exact parity. */
object LogSchemaRegistry {
  private def f(n: String, t: AbiType, idx: Boolean = false) = AbiField(n, t, idx)

  // the ×6-repeated mocexchange commission/total block reads these fields
  // (mocexchange.py:55-90): commission + btcMarkup, mocCommissionValue +
  // mocMarkup, reservePrice, mocPrice
  private val exchangeTail = Seq(
    f("commission", AbiUint), f("reservePrice", AbiUint),
    f("mocCommissionValue", AbiUint), f("mocPrice", AbiUint),
    f("btcMarkup", AbiUint), f("mocMarkup", AbiUint))

  val events: Seq[EventAbi] = Seq(
    // token_riskpro.py:34-98, token_stable.py, token_reserve.py — REAL ERC-20 ABI
    EventAbi("Transfer", Seq(
      f("from", AbiAddress, idx = true), f("to", AbiAddress, idx = true),
      f("value", AbiUint))),
    // token_moc.py:10, token_reserve.py:75
    EventAbi("Approval", Seq(
      f("owner", AbiAddress, idx = true), f("spender", AbiAddress, idx = true),
      f("value", AbiUint))),
    // mocexchange.py:29,141-180
    EventAbi("RiskProMint",
      Seq(f("account", AbiAddress), f("amount", AbiUint), f("reserveTotal", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:125
    EventAbi("RiskProRedeem",
      Seq(f("account", AbiAddress), f("amount", AbiUint), f("reserveTotal", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:217,232-275 (leveraged bucket ops add leverage+interests)
    EventAbi("RiskProxMint",
      Seq(f("bucket", AbiBytes32), f("account", AbiAddress), f("amount", AbiUint),
        f("reserveTotal", AbiUint), f("interests", AbiUint), f("leverage", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:312
    EventAbi("RiskProxRedeem",
      Seq(f("bucket", AbiBytes32), f("account", AbiAddress), f("amount", AbiUint),
        f("reserveTotal", AbiUint), f("interests", AbiUint), f("leverage", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:409
    EventAbi("StableTokenMint",
      Seq(f("account", AbiAddress), f("amount", AbiUint), f("reserveTotal", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:500
    EventAbi("StableTokenRedeem",
      Seq(f("account", AbiAddress), f("amount", AbiUint), f("reserveTotal", AbiUint))
        ++ exchangeTail),
    // mocexchange.py:591 (+interests)
    EventAbi("FreeStableTokenRedeem",
      Seq(f("account", AbiAddress), f("amount", AbiUint), f("reserveTotal", AbiUint),
        f("interests", AbiUint)) ++ exchangeTail),
    // mocinrate.py:29-30
    EventAbi("InrateDailyPay", Seq(
      f("amount", AbiUint), f("daysToSettlement", AbiUint),
      f("nReserveBucketC0", AbiUint))),
    // mocinrate.py:93-94,124-125
    EventAbi("RiskProHoldersInterestPay", Seq(
      f("amount", AbiUint), f("nReserveBucketC0BeforePay", AbiUint))),
    // mocsettlement.py:38-43
    EventAbi("SettlementStarted", Seq(
      f("stableTokenRedeemCount", AbiUint), f("deleveragingCount", AbiUint),
      f("riskProxPrice", AbiUint), f("reservePrice", AbiUint))),
    // mocsettlement.py:86-97
    EventAbi("RedeemRequestAlter", Seq(
      f("redeemer", AbiAddress, idx = true), f("isAddition", AbiBool),
      f("delta", AbiUint))),
    // mocsettlement.py:184-189
    EventAbi("RedeemRequestProcessed", Seq(
      f("redeemer", AbiAddress, idx = true), f("commission", AbiUint),
      f("amount", AbiUint))),
    // mocsettlement.py:240-242
    EventAbi("SettlementRedeemStableToken", Seq(
      f("queueSize", AbiUint), f("accumCommissions", AbiUint),
      f("reservePrice", AbiUint))),
    // mocsettlement.py:316-319,384-385
    EventAbi("SettlementDeleveraging", Seq(
      f("leverage", AbiUint), f("riskProxPrice", AbiUint),
      f("reservePrice", AbiUint), f("startBlockNumber", AbiUint))),
    // mocsettlement.py:411-429 (retention trigger)
    EventAbi("SettlementCompleted", Seq(f("commissionsPayed", AbiUint))),
    // moc.py:16-98
    EventAbi("BucketLiquidation", Seq(f("bucket", AbiBytes32))),
    // moc.py:125-232 — zero-payload notification: the handler reads ONLY
    // receipt-level fields (tx hash, blockNumber, constants 'STABLE'/'C0')
    // and fans out per-holder rows from user state, never a log field
    EventAbi("ContractLiquidated", Seq()),
    // mocstate.py:21-37 (int code mapped through d_states downstream)
    EventAbi("StateTransition", Seq(f("newState", AbiUint))),
    // fastbtcbridge.py:25-30
    EventAbi("NewBitcoinTransfer", Seq(
      f("transferId", AbiBytes32, idx = true), f("btcAddress", AbiString),
      f("nonce", AbiUint), f("amountSatoshi", AbiUint), f("feeSatoshi", AbiUint),
      f("rskAddress", AbiAddress, idx = true))),
    // fastbtcbridge.py:65-66
    EventAbi("BitcoinTransferStatusUpdated", Seq(
      f("transferId", AbiBytes32, idx = true), f("newStatus", AbiUint))))

  val byName: Map[String, EventAbi] = events.map(e => e.name -> e).toMap
  val byTopic0: Map[String, EventAbi] = events.map(e => e.topic0 -> e).toMap

  /** (contract role, event name) rows the reference REGISTERS but routes
    * to the empty handler `""` (scan_events_txs.py:88-95; the dispatch
    * loop's `if event_class:` skips them SILENTLY — no unknown-event
    * warn, no decode, no index write). Warn-path parity: a log matching
    * one of these must be recognized-and-dropped, not warned about. */
  val ignoredDispatch: Set[(String, String)] = Set(
    ("MoCVendors", "VendorReceivedMarkup"),
    ("MoCBProxManager", "BucketMovement"),
    ("MoCToken", "Transfer"))
}

/** row-level decode shared by interpreted eval and generated code */
object LogDecode {
  private def norm(s: UTF8String): String = {
    val t = s.toString.trim.toLowerCase
    if (t.startsWith("0x")) t.substring(2) else t
  }

  private def hexBytes(h: String): Array[Byte] = {
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = java.lang.Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def decode(spec: EventAbi, topics: ArrayData, data: UTF8String): InternalRow =
    try {
      // bounds are checked EXPLICITLY: UnsafeArrayData.getUTF8String does
      // no bounds check (an out-of-range read is a native crash, not an
      // exception), so topic arity must be validated before any access
      if (topics == null ||
        topics.numElements() < 1 + spec.fields.count(_.indexed)) return null
      if (topics.isNullAt(0)) return null
      if (norm(topics.getUTF8String(0)) != spec.topic0) return null
      val dataHex = if (data == null) "" else norm(data)
      val values = new Array[Any](spec.fields.length)
      var ti = 1
      var di = 0
      var i = 0
      while (i < spec.fields.length) {
        val fld = spec.fields(i)
        val word =
          if (fld.indexed) {
            if (topics.isNullAt(ti)) return null
            val w = norm(topics.getUTF8String(ti)); ti += 1; w
          } else { val w = dataHex.substring(64 * di, 64 * di + 64); di += 1; w }
        if (word.length != 64) return null
        values(i) = fld.tpe match {
          case AbiAddress => UTF8String.fromString("0x" + word.substring(24))
          case AbiBytes32 => UTF8String.fromString("0x" + word)
          case AbiBool => java.lang.Boolean.valueOf(word.charAt(63) == '1')
          case AbiUint =>
            val bi = new java.math.BigInteger(word, 16)
            val dec = org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi))
            if (dec.changePrecision(38, 0)) dec else null
          case AbiString =>
            // dynamic tail: head word = byte offset of the length word
            val off = java.lang.Integer.parseInt(word.substring(48), 16) * 2
            val len = java.lang.Integer.parseInt(dataHex.substring(off + 48, off + 64), 16) * 2
            UTF8String.fromBytes(hexBytes(dataHex.substring(off + 64, off + 64 + len)))
        }
        i += 1
      }
      new GenericInternalRow(values)
    } catch {
      case _: RuntimeException => null // short data / bad hex / missing topic
    }
}

/** `decode_log('<EventName>', topics, data) → struct` — event chosen at
  * plan time (the registry fixes the output schema), topic0 checked at
  * row time. Participates in whole-stage codegen via a static call into
  * [[LogDecode]] (the spec rides along as a reference object). */
case class DecodeLogExpr(eventName: String, topics: Expression, data: Expression)
    extends Expression {
  @transient private lazy val spec: EventAbi = LogSchemaRegistry.byName(eventName)

  override def children: Seq[Expression] = Seq(topics, data)
  override def dataType: DataType = spec.structType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_log"

  override def eval(input: InternalRow): Any = {
    val t = topics.eval(input)
    if (t == null) return null
    LogDecode.decode(spec, t.asInstanceOf[ArrayData],
      data.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("abiSpec", spec, classOf[EventAbi].getName)
    val topicsGen = topics.genCode(ctx)
    val dataGen = data.genCode(ctx)
    val row = ctx.freshName("decoded")
    ev.copy(code =
      code"""
        ${topicsGen.code}
        ${dataGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${topicsGen.isNull}) {
          InternalRow $row = graft.plans.LogDecode.decode(
            $specRef, ${topicsGen.value},
            ${dataGen.isNull} ? null : ${dataGen.value});
          if ($row != null) {
            ${ev.isNull} = false;
            ${ev.value} = $row;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecodeLogExpr =
    copy(topics = newChildren(0), data = newChildren(1))
}
