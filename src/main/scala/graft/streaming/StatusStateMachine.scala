package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Transaction status lifecycle — SURVEY.md §2.9 T3/T5: the reference's
  * pending → confirming → confirmed machine with failure edges
  * (`indexer/scan_transaction_status.py:48-139`; duplicated in
  * `scan_moc_state_status.py:50-141`):
  *
  *  - `mined` receipt: confirming, or confirmed outright when the head is
  *    already `ConfirmBlocks` past the tx block;
  *  - `reverted` receipt: failed (scan_transaction_status.py:72-74);
  *  - clock tick: confirming → confirmed once `head − block > ConfirmBlocks`
  *    (events/events.py:12-21), and pending → failed(staleTransaction) when
  *    no receipt arrived within `StaleSeconds` of creation
  *    (scan_transaction_status.py:121-139, 600 s).
  *
  * The transition is a PURE function over (state, event) — the streaming
  * wiring below folds it with `flatMapGroupsWithState`, and the advance of
  * time is itself an event (`tick` carrying head + clock), so tests drive a
  * virtual clock instead of sleeping. Production wiring would additionally
  * register a processing-time timeout as a safety net for partitions that
  * stop receiving ticks.
  *
  * Scale: state is one small row per IN-FLIGHT tx only — terminal states
  * emit once and drop their state immediately (the reference equivalently
  * stops scanning confirmed/failed docs: scan_transaction_status.py:55,87),
  * so state size tracks the confirmation window, not chain history.
  */
final case class TxEvent(txHash: String, kind: String, blockNumber: Long, head: Long, ts: Long)
final case class TxStatus(txHash: String, status: String, blockNumber: Long,
    createdTs: Long, updatedTs: Long)

object StatusStateMachine {
  val ConfirmBlocks = 10L
  val StaleSeconds = 600L

  val Pending = "pending"
  val Confirming = "confirming"
  val Confirmed = "confirmed"
  val Failed = "failed"
  val FailedStale = "failed:staleTransaction"

  def init(ev: TxEvent): TxStatus =
    TxStatus(ev.txHash, Pending, -1L, ev.ts, ev.ts)

  /** pure transition — all lifecycle semantics live here, unit-tested
    * without any streaming machinery. Terminal states ABSORB every further
    * event (the reference never rescans confirmed/failed docs:
    * scan_transaction_status.py:55,87 reads only pending/confirming), so
    * a replayed receipt can never regress a confirmed tx. Cross-batch
    * duplicate delivery after the state was dropped re-initializes from
    * scratch — the sink-side defense is a version-gated upsert
    * (Merge.upsertMonotonic on updatedTs), which the checkpointed source
    * makes failure-recovery-only in practice. */
  def transition(cur: TxStatus, ev: TxEvent): TxStatus = if (isTerminal(cur)) cur
  else ev.kind match {
    case "created" => cur // idempotent on replay (at-least-once delivery)
    case "reverted" => cur.copy(status = Failed, updatedTs = ev.ts)
    case "mined" =>
      val st = if (ev.head - ev.blockNumber > ConfirmBlocks) Confirmed else Confirming
      cur.copy(status = st, blockNumber = ev.blockNumber, updatedTs = ev.ts)
    case "tick" => cur.status match {
      case Pending if ev.ts - cur.createdTs > StaleSeconds =>
        cur.copy(status = FailedStale, updatedTs = ev.ts)
      case Confirming if ev.head - cur.blockNumber > ConfirmBlocks =>
        cur.copy(status = Confirmed, updatedTs = ev.ts)
      case _ => cur
    }
    case _ => cur
  }

  def isTerminal(s: TxStatus): Boolean =
    s.status == Confirmed || s.status.startsWith(Failed)

  /** streaming wiring: per-txHash state, update-mode emission, state
    * dropped on terminal status (bounded state — see scaladoc). */
  def wire(events: Dataset[TxEvent]): Dataset[TxStatus] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.txHash)
      .flatMapGroupsWithState[TxStatus, TxStatus](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[TxEvent], state: GroupState[TxStatus]) =>
          val batch = it.toSeq.sortBy(e => (e.ts, e.kind))
          if (batch.isEmpty) Iterator.empty
          else {
            var cur = state.getOption.getOrElse(init(batch.head))
            batch.foreach(e => cur = transition(cur, e))
            if (isTerminal(cur)) state.remove() else state.update(cur)
            Iterator.single(cur)
          }
      }
  }
}
