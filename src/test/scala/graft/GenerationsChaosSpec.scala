package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CandleStream, Generations}

/** Crash-recovery chaos cases for the Generations commit protocol: kill
  * the driver inside each window of `Generations.commit` and prove the
  * reader keeps serving the prior generation and a post-restart replay
  * converges to the exact batch-program state — the same discipline
  * StreamingSpec applies to the upsert kill-sim.
  *
  * `commit` has two crash windows:
  *  - A: the `gen=N` parquet dir is (partially or fully) written and the
  *    temp marker `.LATEST.N` may exist, but the marker was NOT moved.
  *  - B: the marker WAS atomically moved to `gen=N`, but the process died
  *    before anything else (old generations and debris remain on disk).
  */
class GenerationsChaosSpec extends AnyFunSuite {
  import SparkTestSession._

  private def events() =
    graft.core.Tables.events(spark, sf)
      .select("ts", "event_id", "event_type", "value")
      .orderBy("ts", "event_id").collect()

  private def toDf(rows: Array[org.apache.spark.sql.Row]) =
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      rows.head.schema)

  private def live(dir: String) =
    CandleStream.currentCandles(spark, dir).collect().map(_.toString).toSet

  private def batchOracle() =
    graft.operators.Reports.ohlcBars(spark, sf)
      .collect().map(_.toString).toSet

  test("window A: gen dir + temp marker written, marker not moved — prior generation stays live, replay converges") {
    val ev = events()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val dir = Files.createTempDirectory("gen-chaos-a").toString + "/state"
    CandleStream.mergeBatch(toDf(h1), dir, 0L)
    val afterB0 = live(dir)

    // simulate the batch-1 crash: a gen=1 dir exists on disk (its content
    // is whatever the dying writer got out — here, garbage: a copy of
    // gen=0's rows, which would DOUBLE-COUNT if ever used as merge input)
    // and the temp marker was written but never moved
    val spark2 = spark
    Generations.current(spark2, dir).get.write.parquet(s"$dir/gen=1")
    Files.writeString(Paths.get(dir, ".LATEST.1"), s"$dir/gen=1")

    assert(Generations.markerGen(dir) === Some(0L),
      "an unmoved temp marker must not be visible")
    assert(live(dir) === afterB0, "reader must keep serving generation 0")
    assert(Generations.before(dir, 1L) === Some(s"$dir/gen=0"),
      "the replay's merge input is the state BEFORE the crashed batch, " +
        "never the half-written gen=1")

    // post-restart replay of batch 1: overwrites the garbage gen=1 and
    // moves the marker — state equals the batch program exactly
    CandleStream.mergeBatch(toDf(h2), dir, 1L)
    assert(Generations.markerGen(dir) === Some(1L))
    assert(live(dir) === batchOracle(),
      "replay over the crashed window must converge to the batch program")
    assert(!Files.exists(Paths.get(dir, ".LATEST.1")),
      "the stray temp marker is consumed by the replay's atomic move")
  }

  test("window B: marker moved, then crash — replay is idempotent and stragglers cannot regress") {
    val ev = events()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val dir = Files.createTempDirectory("gen-chaos-b").toString + "/state"
    CandleStream.mergeBatch(toDf(h1), dir, 0L)
    CandleStream.mergeBatch(toDf(h2), dir, 1L)
    // crash here: marker points at gen=1; gen=0 and any temp debris remain
    Files.writeString(Paths.get(dir, ".LATEST.0"), s"$dir/gen=0") // debris
    val committed = live(dir)
    assert(Files.exists(Paths.get(s"$dir/gen=0")),
      "prior generations are retained — the window-B disk shape")

    // restart redelivers batch 1 (checkpoint wrote the offset, sink
    // committed — the classic at-least-once overlap): identical output
    CandleStream.mergeBatch(toDf(h2), dir, 1L)
    assert(Generations.markerGen(dir) === Some(1L))
    assert(live(dir) === committed, "same-id replay must not double-count")
    // a straggler replay of batch 0 rewrites gen=0 but cannot regress
    CandleStream.mergeBatch(toDf(h1), dir, 0L)
    assert(Generations.markerGen(dir) === Some(1L),
      "the marker never moves backwards")
    assert(live(dir) === committed)
    assert(committed === batchOracle())
  }

  test("promote retires generations beyond live + two; staged-above survive and are never merge inputs") {
    // found by the 600-batch soak: commit never deleted old generation
    // dirs, so a long-lived candle/sketch state held one dir PER BATCH
    // (600 gens = 2,400 files). Retirement keeps exactly the live
    // generation, the newest TWO below it (crash-replay's merge input,
    // plus a full promote cycle of slack for racing readers whose
    // best-effort cache pin can be evicted and recompute from disk), and
    // anything staged above the marker.
    val ev = events()
    val slices = ev.grouped(math.max(1, ev.length / 5)).toSeq
    val dir = Files.createTempDirectory("gen-chaos-d").toString + "/state"
    slices.zipWithIndex.foreach { case (s, i) =>
      CandleStream.mergeBatch(toDf(s), dir, i.toLong)
    }
    val last = slices.length - 1
    def gens() = {
      val s = Files.list(Paths.get(dir))
      try {
        val it = scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        it.map(_.getFileName.toString).filter(_.startsWith("gen=")).toSet
      } finally s.close()
    }
    assert(gens() === Set(s"gen=$last", s"gen=${last - 1}", s"gen=${last - 2}"),
      "a long-lived state must hold exactly live + two floor generations")
    assert(Generations.markerGen(dir) === Some(last.toLong))
    assert(live(dir) === batchOracle(), "retirement must not touch the served state")
    assert(Generations.before(dir, last.toLong) === Some(s"$dir/gen=${last - 1}"),
      "the crash-replay merge input survives retirement")
    // a STAGED generation above the marker must never be reaped by promote
    Generations.stage(Generations.current(spark, dir).get, dir, 99L)
    CandleStream.mergeBatch(toDf(slices.head), dir, last + 1L)
    assert(gens().contains("gen=99"),
      "a staged-but-unpromoted artifact survives the stream's own promotes")
    // ...and must never be resolved as a merge input, even once the
    // stream's batch ids pass it: gen=99 carries no commit sentinel, so a
    // crash-replay of batch 100 merges from the newest COMMITTED
    // generation, not the stale staged copy of old state (which would
    // regress or double-count). The round-11 implementation listed dirs
    // by name only and failed exactly here.
    assert(Generations.before(dir, 100L) === Some(s"$dir/gen=${last + 1}"),
      "before() must skip staged (uncommitted) generations")
    // promoting the staged artifact commits it — NOW it is resolvable
    Generations.promote(dir, 99L)
    assert(Generations.before(dir, 100L) === Some(s"$dir/gen=99"),
      "promote marks the staged dir committed (sentinel), making it visible")
  }

  test("non-numeric gen= entries are skipped, not fatal") {
    val ev = events()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val dir = Files.createTempDirectory("gen-chaos-c").toString + "/state"
    CandleStream.mergeBatch(toDf(h1), dir, 0L)
    // a half-cleaned or hand-placed directory that matches the prefix but
    // not the number format — every later micro-batch must ignore it
    Files.createDirectories(Paths.get(dir, "gen=trash"))
    assert(Generations.before(dir, 1L) === Some(s"$dir/gen=0"))
    CandleStream.mergeBatch(toDf(h2), dir, 1L)
    assert(Generations.markerGen(dir) === Some(1L))
    assert(live(dir) === batchOracle())
  }
}
