package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.{Tables => T}
import graft.operators.Api

/** The webservice process — SURVEY.md §3.3 / webservice/app.py:30-51 — as
  * a thin HTTP shell over the SAME DataFrame programs the `api_*` queries
  * oracle-check. Six routes (bp_user_operations.py:9-140,
  * bp_fastbtc_bridge.py:9-53, bp_prices.py:9-77):
  *
  *   GET /api/v1/webapp/transactions/list?address=&token=&limit=&skip=
  *     → `{"transactions": [...], "count": N, "total": M}`
  *   GET /api/v1/webapp/transactions/last?address=&token=
  *     → the newest matching record
  *   GET /api/v1/webapp/fastbtc/pegout?address=&limit=&skip=
  *     → `{"pegout_requests": [...]}`
  *   GET /api/v1/webapp/prices/var
  *     → `{"current": {...}, "delta": {...}}` (24h back, floored to
  *       midnight keeping seconds — the bp_prices.py:44-47 quirk)
  *   GET /api/v1/webapp/stats/freq?tokens=a,b,c
  *     → `{"freq": {...}}` — point-frequency estimates from the live
  *       streaming CMS state (404 when no sketch dir is wired)
  *   GET /api/v1/webapp/prices/ohlc?days=N
  *     → `{"candles": [...]}` — the a8_ohlc daily candle program, newest
  *       N days (extension beyond the reference's price routes)
  *   GET /api/v1/webapp/vectors/topk?vec_id=&k=
  *     → `{"query": id, "neighbors": [...]}` — exact integer-cosine
  *       nearest neighbors from the memoized quantized index (the ANN
  *       family's serving tier; k clamped to [1,20], 404 without an
  *       embeddings table, 400 on a non-integer vec_id)
  *   GET /api/v1/webapp/search?q=&k=
  *     → `{"query": [terms], "results": [...]}` — BM25 top-k documents
  *       from the memoized scored-postings index (TextOps.bm25For; terms
  *       split on whitespace/+, k clamped to [1,20], 400 on empty q, 404
  *       without a documents table, unknown terms contribute nothing)
  *   GET /api/v1/webapp/images/similar?img_id=&k=
  *     → `{"query": id, "similar": [...]}` — perceptual-hash neighbors
  *       from the memoized image hash corpus (ImageDup.similarFor; k
  *       clamped to [1,20], 400 on a non-integer img_id, 404 without a
  *       documents table, unknown img_id serves an empty list)
  *
  * Faithful endpoint semantics: case-insensitive SUBSTRING address match
  * (the reference filters with `$regex ... $options: i`), the excluded-
  * event anti-filter, page-size whitelist (limit ∉ {20,40} resets to 20,
  * lib_tools.py:55-61), address validation = 0x + hex + minimum length
  * (lib_tools.py:28-31), 400 on invalid address. The JDK's built-in
  * HttpServer keeps the shell dependency-free; pages are driver-side
  * collects of TakeOrderedAndProject results — bounded at `limit` rows by
  * construction, so the serving tier never materializes table-scale data.
  */
final class ApiServer(
    spark: SparkSession, dataDir: String,
    minAddressLen: Int = 25,
    /** optional live CMS state dir (graft.streaming.SketchStream) backing
      * /stats/freq — the serving tier reading STREAMING state directly. */
    sketchDir: Option[String] = None,
    /** optional live candle state dir (graft.streaming.CandleStream):
      * when wired, /prices/ohlc serves the STREAMING candles (cached per
      * generation) instead of aggregating the batch table. */
    candleDir: Option[String] = None) {

  private var server: HttpServer = _

  // ── endpoint programs (parameterized versions of the api_* queries) ──

  /** case-insensitive substring address predicate — delegates to the one
    * P6 implementation (Api.ciMatch, oracle-pinned by `p6_ci_match`). */
  private def addrMatch(address: String) =
    Api.ciMatch(col("address"), address)

  private def txFiltered(address: String, token: Option[String]): DataFrame = {
    val base = Api.txView(spark, dataDir)
      .filter(addrMatch(address) && !col("event").isin(Api.Excluded: _*))
    token.fold(base)(t => base.filter(col("token_involved") === t))
  }

  private def render(df: DataFrame): DataFrame =
    df.withColumn("created_at",
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")).drop("ts")

  /** bp_user_operations.py:9-93 — page + count + total envelope. */
  def transactionsList(address: String, token: Option[String],
      limit: Int, skip: Int): String = {
    val f = txFiltered(address, token)
    val page = render(f.orderBy(col("ts").desc, col("event_id").desc)
      .offset(skip).limit(limit)).toJSON.collect()
    val total = f.count()
    s"""{"transactions":[${page.mkString(",")}],"count":${page.length},"total":$total}"""
  }

  /** bp_user_operations.py:96-140 — newest matching record (or `{}`). */
  def transactionsLast(address: String, token: Option[String]): String =
    render(txFiltered(address, token)
      .orderBy(col("ts").desc, col("event_id").desc).limit(1))
      .toJSON.collect().headOption.getOrElse("{}")

  /** bp_fastbtc_bridge.py:9-53 — PEG_OUT transfers for the address. */
  def pegoutRequests(address: String, limit: Int, skip: Int): String = {
    val recs = T.events(spark, dataDir)
      .filter(col("event_type") === "error")
      .select(substring(md5(col("event_id").cast(StringType)), 1, 12).as("transfer_id"),
        concat(lit("0xA"), col("user_id").cast(StringType)).as("address"),
        lit("PEG_OUT").as("type"), col("value"),
        col("ts"), col("event_id"))
      .filter(addrMatch(address))
      .orderBy(col("ts").desc, col("event_id").desc)
      .offset(skip).limit(limit)
    val page = render(recs.drop("event_id")).toJSON.collect()
    s"""{"pegout_requests":[${page.mkString(",")}]}"""
  }

  /** bp_prices.py:9-77 — current snapshot + the newest row in
    * [midnight-floored 24h-back cut, 24h-back cut). */
  def priceVariation(): String = {
    val ev = T.events(spark, dataDir)
    val cur = ev.orderBy(col("event_id").desc).limit(1)
      .select(col("event_id").as("cur_id"), col("value").as("cur_price"),
        col("ts").as("cur_ts"))
      .withColumn("delta_ts", col("cur_ts") - expr("INTERVAL 24 HOURS"))
      .withColumn("floor_ts", timestamp_micros(
        unix_micros(date_trunc("DAY", col("delta_ts")))
          + (unix_micros(col("delta_ts"))
            - unix_micros(date_trunc("MINUTE", col("delta_ts"))))))
    val current = cur.select(col("cur_id").as("event_id"),
      col("cur_price").as("price"),
      date_format(col("cur_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("created_at"))
      .toJSON.collect().headOption.getOrElse("{}")
    val delta = ev.crossJoin(broadcast(cur))
      .filter(col("ts") >= col("floor_ts") && col("ts") < col("delta_ts"))
      .orderBy(col("event_id").desc).limit(1)
      .select(col("event_id"), col("value").as("price"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("created_at"))
      .toJSON.collect().headOption.getOrElse("{}")
    s"""{"current":$current,"delta":$delta}"""
  }

  /** /prices/ohlc?days=N — daily candles as JSON: newest N (clamped to
    * [1, 90], default 30). Two sources, same shape: the LIVE streaming
    * candle state (CandleStream, when `candleDir` is wired and committed
    * — page cached per generation) or the batch a8_ohlc aggregation
    * (page cached for [[ApiServer.OhlcTtlMs]]; the reference's ~30 s
    * block cadence IS its price-staleness budget, BASELINE.md). Either
    * way the collect is bounded at 90 rows of 7 scalars — the state /
    * aggregation has already reduced the stream to one row per day. */
  @volatile private var ohlcCache: (Long, IndexedSeq[String]) = _
  @volatile private var liveOhlcCache: (String, IndexedSeq[String]) = _
  private def candlePage(df: org.apache.spark.sql.DataFrame): IndexedSeq[String] =
    df.orderBy(col("day").desc).limit(90)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .toJSON.collect().toIndexedSeq
  def pricesOhlc(days: Int): String = {
    val n = math.min(math.max(days, 1), 90)
    // live streaming candles when wired AND committed: cached per
    // GENERATION (the marker is the key — a micro-batch commit
    // invalidates), so a burst of requests against one generation costs
    // one bounded read of the few-rows-per-day state
    val live = candleDir.flatMap(cd =>
      graft.streaming.Generations.latestDir(cd).map { gen =>
        val c = liveOhlcCache
        if (c != null && c._1 == gen) c._2
        else {
          val all = candlePage(
            graft.streaming.CandleStream.currentCandles(spark, cd))
          liveOhlcCache = (gen, all)
          all
        }
      })
    val rows = live.getOrElse {
      // batch-table path, recomputed at most once per TTL
      val now = System.currentTimeMillis()
      val cached = ohlcCache
      if (cached != null && now - cached._1 < ApiServer.OhlcTtlMs) cached._2
      else {
        val all = candlePage(graft.operators.Reports.ohlcBars(spark, dataDir))
        ohlcCache = (now, all)
        all
      }
    }
    s"""{"candles":[${rows.take(n).mkString(",")}]}"""
  }

  /** /stats/freq?tokens=a,b,c — point-frequency estimates from the LIVE
    * streaming CMS state (SketchStream's generation dir). Served via the
    * driver-side fast path: the ≤4096-cell sketch is cached per
    * generation, so a request is pure arithmetic — no Spark job — and a
    * new micro-batch commit invalidates the cache by moving the marker.
    * 404 when no sketch dir is wired. */
  def statsFreq(tokens: Seq[String]): String = {
    val dir = sketchDir.getOrElse(
      throw new IllegalStateException("no sketch state wired"))
    val est = graft.streaming.SketchStream.estimateServing(spark, dir, tokens.take(32))
    tokens.take(32).map(t =>
      s""""${jsonEscape(t)}":${est.getOrElse(t, 0L)}""")
      .mkString("{\"freq\":{", ",", "}}")
  }

  /** /vectors/topk — the ANN family behind the serving tier: exact
    * integer-cosine nearest neighbors of a corpus vector from the SAME
    * memoized quantized index the ss_topk_* queries read
    * (VectorOps.topkFor: broadcast query row, global BoundedTopK — the
    * collect is bounded at k rows by construction). `mode=graph` (round
    * 14) serves the HNSW-style beam walk over the persisted k-NN graph
    * instead (VectorOps.topkGraphFor — per-hop work is beam·degree corpus
    * lookups, the structure a 100 TB ANN deployment actually serves
    * from); any other mode value scans exact. Unknown vec_id serves an
    * empty list, not an error: both query programs are total. */
  def vectorsTopk(vecId: Long, k: Int, mode: String = "exact"): String = {
    val df =
      if (mode == "graph") graft.operators.VectorOps.topkGraphFor(spark, dataDir, vecId, k)
      else graft.operators.VectorOps.topkFor(spark, dataDir, vecId, k)
    val rows = df.collect()
    rows.map(r =>
      s"""{"vec_id":${r.getLong(0)},"cos":${jsonNum(r.getDouble(1))},"rnk":${r.getLong(2)}}""")
      .mkString(s"""{"query":$vecId,"mode":"${jsonEscape(mode)}","neighbors":[""", ",", "]}")
  }

  /** /search — the BM25 retrieval tier over the memoized scored-postings
    * index (TextOps.bm25For: broadcast term set, one keyed agg, global
    * BoundedTopK — the collect is bounded at k rows by construction).
    * Terms the corpus has never seen contribute nothing; an all-unknown
    * query serves an empty result list, not an error. */
  def searchBm25(terms: Seq[String], k: Int): String = {
    val rows = graft.operators.TextOps.bm25For(spark, dataDir, terms, k).collect()
    val results = rows.map(r =>
      s"""{"doc_id":${r.getLong(0)},"score":${r.getLong(1)},"rnk":${r.getLong(2)}}""")
      .mkString("[", ",", "]")
    val q = terms.map(t => "\"" + jsonEscape(t) + "\"").mkString("[", ",", "]")
    s"""{"query":$q,"results":$results}"""
  }

  /** /images/similar — perceptual-hash image retrieval over the memoized
    * hash corpus (ImageDup.similarFor: broadcast single-image band probe,
    * global BoundedTopK, collect bounded at k). Unknown img_id serves an
    * empty list: total, like the vector route. */
  def imagesSimilar(imgId: Long, k: Int): String = {
    val rows = graft.operators.ImageDup.similarFor(spark, dataDir, imgId, k).collect()
    rows.map(r =>
      s"""{"img_id":${r.getLong(0)},"hamming":${r.getLong(1)},"rnk":${r.getLong(2)}}""")
      .mkString(s"""{"query":$imgId,"similar":[""", ",", "]}")
  }

  /** doubles → JSON: NaN/Infinity are not valid JSON literals, so map any
    * non-finite value to null. topkFor scores only through the total
    * cosFrom today and never produces one — this guard makes the route's
    * output parseable under ANY future scorer change rather than relying
    * on that non-local invariant. */
  private def jsonNum(v: Double): String =
    if (java.lang.Double.isFinite(v)) v.toString else "null"

  /** proper JSON string escaping (backslash, quote, control chars) — keys
    * must round-trip the requested token exactly; stripping characters
    * instead would let distinct tokens collide on one key. */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  // ── HTTP shell ────────────────────────────────────────────────────────

  /** lib_tools.py:28-31 */
  private def checkAddress(a: String): Boolean =
    a != null && a.length >= minAddressLen &&
      a.take(2).equalsIgnoreCase("0x") &&
      a.drop(2).forall(c => Character.digit(c, 16) >= 0)

  /** lib_tools.py:55-61: limit outside the whitelist resets to default. */
  private def pageLimit(params: Map[String, String]): Int = {
    val l = params.get("limit").flatMap(_.toIntOption)
      .getOrElse(Api.AllowedPageSizes.head)
    if (Api.AllowedPageSizes.contains(l)) l else Api.AllowedPageSizes.head
  }

  private def parseQuery(raw: String): Map[String, String] =
    Option(raw).toSeq.flatMap(_.split('&')).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k ->
          java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
        case _ => None
      }
    }.toMap

  private def respond(ex: HttpExchange, status: Int, body: String,
      mime: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", mime)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** route requiring a valid `address` param (400 otherwise, like every
    * address endpoint in the reference). */
  private def addressRoute(path: String)(
      handler: (Map[String, String], String) => String): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val params = parseQuery(ex.getRequestURI.getRawQuery)
      params.get("address").filter(checkAddress) match {
        case None => respond(ex, 400, "Invalid Address", "text/plain")
        case Some(addr) =>
          try respond(ex, 200, handler(params, addr))
          catch { case e: Exception =>
            respond(ex, 500, "Server error", "text/plain") }
      }
    })

  /** bind (port 0 = ephemeral) and serve; returns the bound port. */
  def start(port: Int = 0): Int = {
    require(server == null, "already started")
    server = HttpServer.create(new InetSocketAddress(port), 0)
    addressRoute("/api/v1/webapp/transactions/list") { (p, addr) =>
      transactionsList(addr, p.get("token"), pageLimit(p),
        p.get("skip").flatMap(_.toIntOption).getOrElse(0))
    }
    addressRoute("/api/v1/webapp/transactions/last") { (p, addr) =>
      transactionsLast(addr, p.get("token"))
    }
    addressRoute("/api/v1/webapp/fastbtc/pegout") { (p, addr) =>
      pegoutRequests(addr, pageLimit(p),
        p.get("skip").flatMap(_.toIntOption).getOrElse(0))
    }
    server.createContext("/api/v1/webapp/prices/var", (ex: HttpExchange) => {
      try respond(ex, 200, priceVariation())
      catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
    })
    server.createContext("/api/v1/webapp/stats/freq", (ex: HttpExchange) => {
      val p = parseQuery(ex.getRequestURI.getRawQuery)
      if (sketchDir.isEmpty) respond(ex, 404, "no sketch state", "text/plain")
      else try respond(ex, 200, statsFreq(
        p.get("tokens").map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)))
      catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
    })
    server.createContext("/api/v1/webapp/prices/ohlc", (ex: HttpExchange) => {
      val p = parseQuery(ex.getRequestURI.getRawQuery)
      try respond(ex, 200,
        pricesOhlc(p.get("days").flatMap(_.toIntOption).getOrElse(30)))
      catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
    })
    server.createContext("/api/v1/webapp/vectors/topk", (ex: HttpExchange) => {
      val p = parseQuery(ex.getRequestURI.getRawQuery)
      p.get("vec_id").flatMap(_.toLongOption) match {
        case None => respond(ex, 400, "Invalid vec_id", "text/plain")
        case Some(id) =>
          if (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(dataDir, "embeddings.parquet")))
            respond(ex, 404, "no embeddings", "text/plain")
          else try respond(ex, 200, vectorsTopk(id,
            p.get("k").flatMap(_.toIntOption).map(_.max(1).min(20)).getOrElse(5),
            p.getOrElse("mode", "exact")))
          catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
      }
    })
    server.createContext("/api/v1/webapp/images/similar", (ex: HttpExchange) => {
      val p = parseQuery(ex.getRequestURI.getRawQuery)
      p.get("img_id").flatMap(_.toLongOption) match {
        case None => respond(ex, 400, "Invalid img_id", "text/plain")
        case Some(id) =>
          if (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(dataDir, "documents.parquet")))
            respond(ex, 404, "no documents", "text/plain")
          else try respond(ex, 200, imagesSimilar(id,
            p.get("k").flatMap(_.toIntOption).map(_.max(1).min(20)).getOrElse(5)))
          catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
      }
    })
    server.createContext("/api/v1/webapp/search", (ex: HttpExchange) => {
      val p = parseQuery(ex.getRequestURI.getRawQuery)
      val terms = p.get("q").map(_.split("[\\s+]+").toSeq.filter(_.nonEmpty))
        .getOrElse(Nil)
      if (terms.isEmpty) respond(ex, 400, "Missing q", "text/plain")
      else if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(dataDir, "documents.parquet")))
        respond(ex, 404, "no documents", "text/plain")
      else try respond(ex, 200, searchBm25(terms,
        p.get("k").flatMap(_.toIntOption).map(_.max(1).min(20)).getOrElse(5)))
      catch { case e: Exception => respond(ex, 500, "Server error", "text/plain") }
    })
    // health/info routes (webservice/bp_main.py:10-26): `/` empty-200,
    // `/ping` a fixed OK string, `/infoapi` the version/store-health doc
    // (Mongo server version → Spark version; collections-present check →
    // required parquet tables present under dataDir)
    server.createContext("/ping", (ex: HttpExchange) =>
      respond(ex, 200, "webAppAPI OK", "text/plain"))
    server.createContext("/infoapi", (ex: HttpExchange) =>
      respond(ex, 200, infoApi()))
    server.createContext("/", (ex: HttpExchange) => {
      // exact-path match only — HttpServer's "/" context is the fallback
      // for every unmapped path, which must stay 404
      if (ex.getRequestURI.getPath == "/") respond(ex, 200, "", "text/plain")
      else respond(ex, 404, "Not Found", "text/plain")
    })
    server.setExecutor(null) // serve on the dispatch thread; Spark does the work
    server.start()
    server.getAddress.getPort
  }

  /** /infoapi — the API-info doc (webservice/bp_main.py:12-16): version
    * stamp, engine version, and store health (all required tables
    * readable under dataDir — the analogue of REQ_COLLECTIONS). */
  def infoApi(): String = {
    val tablesOk = ApiServer.RequiredTables.forall(t =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(dataDir, s"$t.parquet")))
    s"""{"webAppAPI":"${ApiServer.ApiVersion}","Spark":"${spark.version}",""" +
      s""""DataBaseData":{"Store":"parquet:$dataDir","DB_Collections_Ok":$tablesOk}}"""
  }

  def stop(): Unit = if (server != null) { server.stop(0); server = null }
}

/** config-driven construction — the app-shell wiring app.py:30-51 does
  * with its ConfigParser: the webservice reads its store coordinates from
  * the resolved settings doc. The parquet profile maps the store's db
  * name to the dataset root directory (the same seam DocumentSink uses). */
object ApiServer {
  /** API version stamp served by /infoapi (lib_tools.py:40 shape). */
  val ApiVersion = "202608141200"
  /** candle-page cache TTL — the reference's block cadence (~30 s) is the
    * price tier's staleness budget. */
  val OhlcTtlMs = 30000L
  /** tables the serving endpoints read — the REQ_COLLECTIONS analogue. */
  val RequiredTables: Seq[String] = Seq("events", "orders")

  def fromConfig(spark: SparkSession, cfg: graft.core.Config.Resolved): ApiServer =
    new ApiServer(spark, cfg.storeDb)
}
