package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Config
import graft.streaming.{CandleStream, Pipelines, Triggers}

/** The config-driven boot path end to end: a settings document (the
  * reference's settings-*.json shape) selects the dataset root to read
  * and the state root to write; GraftApp.boot starts the task set at the
  * configured cadences plus the serving tier, and a brief run leaves
  * Transaction state, cursor history, and live candles under the store
  * uri with the HTTP surface answering.
  */
class AppBootSpec extends AnyFunSuite {
  import SparkTestSession._

  test("boot from settings: tasks run, state lands under the store uri, serving answers") {
    val stateRoot = Files.createTempDirectory("graft-app").toString
    val settings =
      s"""{
         |  "mongo": {"uri": "$stateRoot", "db": "$sf"},
         |  "tasks": {"scan_raw_txs": {"interval": 1}, "scan_prices": {"interval": 1}},
         |  "networks": {"tn": {"app_mode": "MoC", "addresses": {}}}
         |}""".stripMargin
    val cfg = Config.resolve(Map.empty, Some(settings), Some("tn"), Some("tn"))
    // the cadence comes from the settings doc, not the pinned default
    assert(Triggers.forTask(cfg, "scan_raw_txs", Triggers.Events) ===
      Trigger.ProcessingTime("1 seconds"))

    val running = GraftApp.boot(spark, cfg)
    try {
      running.tasks.foreach(_.processAllAvailable())

      val tx = Pipelines.readState(spark, s"$stateRoot/Transaction")
      assert(tx.count() > 0, "scan_raw_txs must upsert Transaction state")
      assert(tx.columns.contains("amount_wei") && tx.columns.contains("status"))

      assert(spark.read.parquet(s"$stateRoot/moc_indexer_history").count() >= 1,
        "every scan pass appends a cursor audit row")

      assert(CandleStream.currentCandles(spark, s"$stateRoot/candles").count() > 0,
        "scan_prices must maintain live candle state")

      // scan_moc_state's folded docs equal the oracle-checked batch query
      // over the same events — the streaming fold IS the batch definition
      val cols = Seq("block_height", "bitcoin_price", "bprox2_price_rbtc",
        "bprox2_price_usd", "blocks_to_settlement", "state", "paused",
        "commission_rates")
      val folded = Pipelines.readState(spark, s"$stateRoot/MocState")
        .select(cols.head, cols.tail: _*).orderBy("block_height")
        .collect().map(_.toSeq).toSeq
      val batch = graft.core.QueryRegistry.byName("s15_mocstate_doc")
        .fn(spark, sf).select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).toSeq
      assert(folded === batch,
        "the streaming-folded MocState must equal the batch s15 query")

      def get(path: String): (Int, String) = {
        val conn = java.net.URI.create(s"http://127.0.0.1:${running.port}$path")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val body = new String(
          (if (code == 200) conn.getInputStream else conn.getErrorStream).readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        (code, body)
      }
      assert(get("/ping")._1 === 200)
      val (ohlcCode, ohlcBody) = get("/api/v1/webapp/prices/ohlc?days=5")
      assert(ohlcCode === 200)
      assert(ohlcBody.contains(""""vwap":"""),
        "the candle page must serve the state this boot maintains")
    } finally running.stop()
  }

  test("boot fails loudly on a typo'd network, like the reference") {
    val settings =
      s"""{"mongo": {"uri": "/tmp/x", "db": "$sf"},
         | "networks": {"tn": {"app_mode": "MoC"}}}""".stripMargin
    val cfg = Config.resolve(Map.empty, Some(settings), Some("tn"), Some("nope"))
    intercept[IllegalArgumentException] { GraftApp.boot(spark, cfg) }
  }
}
