package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.streaming.{CandleStream, Pipelines}

/** END-TO-END streaming latency budget — the whole indexing chain the
  * reference runs as its scan loop (tasks_manager.py cadence: scan every
  * 3-10 s against ~30 s blocks, 180 s task timeout), driven continuously
  * as one micro-batched pipeline:
  *
  *   event stream → canonical per-event derivation (EventUnion.canonical,
  *   the SAME function the oracle-checked batch query runs) → Transaction
  *   keyed upsert (bucketed generation state) → dirty-user balance refresh
  *   (UserState upsert) → OHLC candle state merge → cursor advance with
  *   history → live serving read (ApiServer /prices/ohlc page from the
  *   generation-cached candle state).
  *
  * Per batch it records (a) INGEST latency: addData → all five state
  * writes committed; (b) FRESHNESS probe: how long a reader takes to see
  * the batch's newest block in the Transaction state (readState + max);
  * (c) SERVE latency: one live HTTP page from the just-advanced candle
  * generation. End-to-end staleness for a block is bounded by
  * scan-interval + p99(ingest) + freshness-probe — the number to hold
  * under the reference's own 3-10 s cadence.
  *
  * Batches deliver the sf events table in `nBatches` slices ordered by
  * event_id (the block proxy) — thousands of events per batch, i.e. orders
  * of magnitude denser than the chain's tens-of-txs per 30 s block, so the
  * recorded latencies are a stress ceiling, not a best case.
  * Usage: runMain graft.tools.E2EBench [sfDir] [nBatches]
  */
object E2EBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evs = spark.read.parquet(s"$sfDir/events.parquet")
    val tsCol = evs.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    val rows = evs
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsCol.as("ts"), col("value"))
      .orderBy("event_id")
      .as[(Long, Long, String, java.sql.Timestamp, Double)].collect()
    val per = math.max(1, rows.length / nBatches)

    val base = java.nio.file.Files.createTempDirectory("graft-e2ebench").toString
    val txDir = s"$base/Transaction" // StatusDrain's convention
    // Transaction keys are MONOTONIC in event_id, so the state is laid out
    // in RANGE buckets: an append-mostly batch touches only tail buckets
    // (O(batch) write amplification at any state size) and the status
    // drain's window is range-local. Hash stays the default for states
    // with uniform point-update keys (UserState below).
    val txBucketing = Some(Pipelines.Bucketing.range("event_id", 4096L))
    val userDir = s"$base/user"
    val candleDir = s"$base/candles"
    val cursorDir = s"$base/cursor"

    // chain head as seen so far — batches are applied strictly in order
    // (processAllAvailable between addData calls), so plain vars suffice
    @volatile var head = 0L
    @volatile var headTs: java.sql.Timestamp = new java.sql.Timestamp(0)

    def userDelta(batch: DataFrame): DataFrame = {
      val d4 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 4))
      batch.filter(col("event_type").isin("purchase", "click"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", d4(col("value")))
            .otherwise(-d4(col("value"))))
          .cast(DecimalType(38, 4)).as("delta"))
    }

    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
    val stream = in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value")
    // per-stage wall accumulators: where the per-batch floor actually goes
    val stageNs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    def staged[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      try body finally stageNs
        .computeIfAbsent(name, _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(System.nanoTime() - t0)
    }
    val query = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().persist()
        val headDf = spark.range(1).select(lit(head).as("h"))
        // 1. canonical Transaction rows — the oracle-checked derivation —
        //    plus the status loop's pending-queue append
        staged("tx_upsert") {
          val tx = graft.operators.EventUnion.canonical(b, headDf).persist()
          Pipelines.upsertBatch(spark, txDir, tx,
            Seq("event_id", "event", "address"), bucketing = txBucketing,
            batchId = Some(batchId))
          graft.streaming.StatusDrain.appendPending(spark, base, tx)
          tx.unpersist()
          ()
        }
        // 2. dirty-user balance refresh: batch deltas folded onto the
        //    prior state INSIDE the merge job (accumulator merge — one
        //    state read per batch, not a full read + a touched re-read),
        //    with the _BATCHID replay guard making the non-idempotent
        //    fold effectively-once across crash-replays
        staged("user_refresh") {
          Pipelines.upsertBatch(spark, userDir, userDelta(b), Seq("user_id"),
            batchId = Some(batchId),
            mergeWith = Some { (prior, d) =>
              prior match {
                case Some(st) => st.join(d, Seq("user_id"), "full_outer")
                  .select(col("user_id"),
                    when(col("delta").isNull, col("balance")) // untouched rows bit-identical
                      .otherwise((coalesce(
                          col("balance").cast(DecimalType(38, 4)),
                          lit(0).cast(DecimalType(38, 4))) + col("delta"))
                        .cast(DoubleType)).as("balance"))
                case None => d.select(col("user_id"),
                  col("delta").cast(DoubleType).as("balance"))
              }
            })
        }
        // 3. OHLC candle state (price serving tier)
        staged("candles") {
          CandleStream.mergeBatch(
            b.select(col("ts"), col("event_id"), col("event_type"), col("value")),
            candleDir, batchId)
        }
        // 4. cursor advance + audit history
        staged("cursor") {
          Pipelines.advanceCursor(spark, cursorDir,
            spark.range(1).select(
              lit(true).as("processed"), lit(head).as("block_number"),
              lit(headTs).as("block_ts"), lit(head).as("last_raw_tx_block"),
              lit(head).as("last_moc_status_block"),
              current_timestamp().as("updatedAt")))
        }
        // 5. status drain: flip now-ripe pending rows (the reference's
        //    scan_transactions_status loop) — O(window), bucket-pruned
        staged("status_drain") {
          graft.streaming.StatusDrain.drain(spark, base, head, txBucketing)
        }
        b.unpersist()
        ()
      }.start()

    val srv = new graft.serving.ApiServer(spark, sfDir, minAddressLen = 3,
      candleDir = Some(candleDir))
    val port = srv.start()
    def serveOnce(): Double = {
      val t0 = System.nanoTime()
      val conn = java.net.URI
        .create(s"http://127.0.0.1:$port/api/v1/webapp/prices/ohlc?days=30")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setReadTimeout(120000)
      require(conn.getResponseCode == 200, "non-200 from /prices/ohlc")
      conn.getInputStream.readAllBytes()
      conn.disconnect()
      (System.nanoTime() - t0) / 1e6
    }

    val ingestSec = scala.collection.mutable.ArrayBuffer.empty[Double]
    val freshMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val serveMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      rows.grouped(per).foreach { g =>
        head = math.max(head, g.map(_._1).max)
        headTs = g.map(_._4).maxBy(_.getTime)
        val t0 = System.nanoTime()
        in.addData(g.toIndexedSeq)
        query.processAllAvailable()
        ingestSec += (System.nanoTime() - t0) / 1e9
        // freshness: a cold reader resolving the batch's newest block out
        // of the Transaction state it was just merged into
        val f0 = System.nanoTime()
        val seen = Pipelines.readState(spark, txDir)
          .agg(max(col("event_id"))).collect()(0).getLong(0)
        freshMs += (System.nanoTime() - f0) / 1e6
        require(seen == head, s"state head $seen != ingested head $head")
        serveMs += serveOnce()
      }
    } finally {
      query.stop(); srv.stop()
    }

    // final-state sanity: the streamed Transaction state must hold exactly
    // the batch program's rows for the full event table at this head
    val nState = Pipelines.readState(spark, txDir).count()
    // status-loop invariant: after the final drain at the final head, only
    // rows inside the confirmation window may still read `confirming`
    val nConfirming = Pipelines.readState(spark, txDir)
      .filter(col("status") === "confirming").count()
    val nDeep = Pipelines.readState(spark, txDir)
      .filter(col("status") === "confirming"
        && lit(head) - col("event_id") > graft.streaming.StatusDrain.Depth).count()
    require(nDeep == 0, s"$nDeep past-depth rows still confirming after the drain")
    val nUsers = Pipelines.readState(spark, userDir).count()
    val nDays = CandleStream.currentCandles(spark, candleDir).count()
    val nCursor = spark.read.parquet(s"$cursorDir/moc_indexer_history").count()

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // scalastyle:off println
    println(s"""{"metric":"e2e_chain","sf":"$sfDir","events":${rows.length},"batches":${ingestSec.length},"events_per_batch":$per,""" +
      s""""ingest_sec":{"p50":${fmt(pct(ingestSec.toSeq, 0.5))},"p95":${fmt(pct(ingestSec.toSeq, 0.95))},"p99":${fmt(pct(ingestSec.toSeq, 0.99))},"max":${fmt(ingestSec.max)},"mean":${fmt(ingestSec.sum / ingestSec.length)}},""" +
      s""""freshness_ms":{"p50":${fmt(pct(freshMs.toSeq, 0.5))},"p99":${fmt(pct(freshMs.toSeq, 0.99))}},""" +
      s""""serve_ohlc_ms":{"p50":${fmt(pct(serveMs.toSeq, 0.5))},"p99":${fmt(pct(serveMs.toSeq, 0.99))}},""" +
      s""""events_per_sec":${fmt(rows.length / ingestSec.sum)},""" +
      s""""stage_mean_sec":{${
        scala.jdk.CollectionConverters.MapHasAsScala(stageNs).asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${fmt(v.get / 1e9 / ingestSec.length)}""" }
          .mkString(",")
      }},""" +
      s""""state":{"tx_rows":$nState,"confirming_in_window":$nConfirming,"users":$nUsers,"candle_days":$nDays,"cursor_advances":$nCursor},""" +
      s""""reference_budget":{"scan_interval_sec":"3-10","block_time_sec":30,"task_timeout_sec":180}}""")
    // scalastyle:on println
    spark.stop()
  }
}
