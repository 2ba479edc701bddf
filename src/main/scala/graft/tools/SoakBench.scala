package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.streaming.{CandleStream, Pipelines, StatusDrain}

/** LONG-HORIZON streaming soak (round 11): the per-batch machinery —
  * range-bucketed generation upserts, LSM-ish retirement of old
  * generations, status-drain windows, candle merges, cursor history — is
  * spec-proven per batch and E2EBench-measured over ~25 batches; this
  * drives the SAME chain over hundreds of micro-batches to catch what
  * only a horizon shows: per-batch latency DRIFT (a slow leak in planning
  * time, accumulated listener state, or file-count growth), UNBOUNDED
  * state-dir file counts (generation retirement or compaction quietly
  * failing), and driver RSS creep.
  *
  * The event table is replayed in PASSES with event_id/ts shifted forward
  * each pass — the head keeps advancing (append-mostly tail buckets, like
  * a chain), user_ids recycle (the balance fold keeps hitting the same
  * keys — the accumulator path, where a leak would compound), and candle
  * days stay a bounded set (the merge path, not append). Every `sample`
  * batches it snapshots wall/files/RSS; the summary reports first-vs-last
  * quintile latency (drift), min/max file counts, and RSS slope.
  *
  * Usage: runMain graft.tools.SoakBench [sfDir] [nBatches] [outPath]
  */
object SoakBench {
  private def countFiles(root: String): Long = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).count() finally s.close()
  }

  private def rssMb(): Double = {
    val lines = Files.readAllLines(Paths.get("/proc/self/status"))
    val it = lines.iterator()
    while (it.hasNext) {
      val l = it.next()
      if (l.startsWith("VmRSS:"))
        return l.split("\\s+")(1).toDouble / 1024.0
    }
    0.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nBatches = if (args.length > 1) args(1).toInt else 600
    val outPath = if (args.length > 2) args(2) else "soak_chain.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val idSpan = rows.map(_._1).max + 1
    val perPass = 120 // batches per replay pass
    val per = math.max(1, rows.length / perPass)

    val base = Files.createTempDirectory("graft-soak").toString
    val txDir = s"$base/Transaction"
    val txBucketing = Some(Pipelines.Bucketing.range("event_id", 4096L))
    val userDir = s"$base/user"
    val candleDir = s"$base/candles"
    val cursorDir = s"$base/cursor"

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
    val query = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().persist()
        val headDf = spark.range(1).select(lit(head).as("h"))
        val tx = graft.operators.EventUnion.canonical(b, headDf).persist()
        Pipelines.upsertBatch(spark, txDir, tx,
          Seq("event_id", "event", "address"), bucketing = txBucketing,
          batchId = Some(batchId))
        StatusDrain.appendPending(spark, base, tx)
        tx.unpersist()
        Pipelines.upsertBatch(spark, userDir, userDelta(b), Seq("user_id"),
          batchId = Some(batchId),
          mergeWith = Some { (prior, d) =>
            prior match {
              case Some(st) => st.join(d, Seq("user_id"), "full_outer")
                .select(col("user_id"),
                  when(col("delta").isNull, col("balance"))
                    .otherwise((coalesce(
                        col("balance").cast(DecimalType(38, 4)),
                        lit(0).cast(DecimalType(38, 4))) + col("delta"))
                      .cast(DoubleType)).as("balance"))
              case None => d.select(col("user_id"),
                col("delta").cast(DoubleType).as("balance"))
            }
          })
        CandleStream.mergeBatch(
          b.select(col("ts"), col("event_id"), col("event_type"), col("value")),
          candleDir, batchId)
        Pipelines.advanceCursor(spark, cursorDir,
          spark.range(1).select(
            lit(true).as("processed"), lit(head).as("block_number"),
            lit(headTs).as("block_ts"), lit(head).as("last_raw_tx_block"),
            lit(head).as("last_moc_status_block"),
            current_timestamp().as("updatedAt")),
          // the knob the round-11 soak asked for: without it the history
          // appender grew all_state_files ~2/advance for 600 batches
          historyRetain = Some(100))
        StatusDrain.drain(spark, base, head, txBucketing)
        b.unpersist()
        ()
      }.start()

    val wall = scala.collection.mutable.ArrayBuffer.empty[Double]
    val samples = scala.collection.mutable.ArrayBuffer.empty[String]
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val sample = 25
    try {
      var done = 0
      var pass = 0
      while (done < nBatches) {
        val it = rows.grouped(per)
        while (it.hasNext && done < nBatches) {
          val g0 = it.next()
          // shift ids forward per pass (head advances like a chain); keep
          // users + candle days recycling so those states stay bounded
          val g = g0.map { case (eid, uid, et, ts, v) =>
            (eid + pass * idSpan, uid, et,
              new java.sql.Timestamp(ts.getTime + pass * 1000L), v)
          }
          head = math.max(head, g.map(_._1).max)
          headTs = g.map(_._4).maxBy(_.getTime)
          val t0 = System.nanoTime()
          in.addData(g.toIndexedSeq)
          query.processAllAvailable()
          wall += (System.nanoTime() - t0) / 1e9
          done += 1
          if (done % sample == 0) {
            samples += s"""{"batch":$done,"wall_s":${fmt(wall.last)},""" +
              s""""tx_files":${countFiles(txDir)},"all_state_files":${countFiles(base)},""" +
              s""""rss_mb":${fmt(rssMb())}}"""
            // scalastyle:off println
            println(s"[soak] batch $done/$nBatches wall=${fmt(wall.last)}s " +
              s"txFiles=${countFiles(txDir)} rss=${fmt(rssMb())}MB")
            // scalastyle:on println
          }
        }
        pass += 1
      }
    } finally query.stop()

    // state invariants after the horizon: the head drained, rows intact
    val nState = Pipelines.readState(spark, txDir).count()
    val nDeep = Pipelines.readState(spark, txDir)
      .filter(col("status") === "confirming"
        && lit(head) - col("event_id") > StatusDrain.Depth).count()
    require(nDeep == 0, s"$nDeep past-depth rows still confirming after drain")

    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val q = wall.length / 5
    val first = wall.take(q).toSeq
    val last = wall.takeRight(q).toSeq
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; s(math.min(s.length - 1, (p * s.length).toInt))
    }
    val out =
      s"""{"metric":"soak_chain","sf":"$sfDir","batches":${wall.length},"events_per_batch":$per,""" +
      s""""wall_s":{"p50":${fmt(pct(wall.toSeq, 0.5))},"p95":${fmt(pct(wall.toSeq, 0.95))},"p99":${fmt(pct(wall.toSeq, 0.99))},"mean":${fmt(mean(wall.toSeq))}},""" +
      s""""drift":{"first_quintile_mean_s":${fmt(mean(first))},"last_quintile_mean_s":${fmt(mean(last))},"ratio":${fmt(mean(last) / mean(first))}},""" +
      s""""tx_rows":$nState,"samples":[${samples.mkString(",")}]}"""
    Files.writeString(Paths.get(outPath), out + "\n")
    // scalastyle:off println
    println(out.take(600))
    // scalastyle:on println
    spark.stop()
  }
}
