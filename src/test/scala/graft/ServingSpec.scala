package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.ApiServer

/** Drives the HTTP serving shell end-to-end against sf0.001: real sockets,
  * real request parsing, the same DataFrame programs the api_* queries
  * oracle-check underneath.
  */
class ServingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf = "/root/testdata/sf0.001"

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$pathAndQuery").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(60000)
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (status, body)
  }

  private def withServer(minAddrLen: Int)(f: Int => Unit): Unit = {
    val srv = new ApiServer(spark, sf, minAddressLen = minAddrLen)
    val port = srv.start()
    try f(port) finally srv.stop()
  }

  test("transactions/list returns the {transactions, count, total} envelope") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port,
        "/api/v1/webapp/transactions/list?address=0xA7&limit=20&skip=0")
      assert(status === 200)
      assert(body.startsWith("""{"transactions":["""))
      val count = """"count":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
      val total = """"total":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
      assert(count > 0 && count <= 20)
      assert(total >= count)
      // excluded events are filtered like the reference's EXCLUDED_EVENTS
      assert(!body.contains("TransferFromMoC") && !body.contains("QueueDOC"))
      // substring address semantics: 0xA7 also matches 0xA7x addresses
      assert(body.contains(""""address":"0xA7"""))
    }
  }

  test("address match is case-insensitive substring (one P6 implementation)") {
    withServer(minAddrLen = 3) { port =>
      // mixed-case partial needle: the stored addresses are 0xA<digits>;
      // 'Xa7' matches them case-folded, and only as a substring
      val (status, body) = get(port,
        "/api/v1/webapp/transactions/list?address=0Xa7&limit=20&skip=0")
      assert(status === 200)
      val total = """"total":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
      assert(total > 0, "case-folded partial address must match")
      val (_, exact) = get(port,
        "/api/v1/webapp/transactions/list?address=0xA7&limit=20&skip=0")
      val totalExact = """"total":(\d+)""".r.findFirstMatchIn(exact).get.group(1).toInt
      assert(total === totalExact, "case must not change the match set")
    }
  }

  test("pagination: out-of-whitelist limit resets to 20; skip shifts the page") {
    withServer(minAddrLen = 3) { port =>
      val (_, bad) = get(port,
        "/api/v1/webapp/transactions/list?address=0xA&limit=33")
      val badCount = """"count":(\d+)""".r.findFirstMatchIn(bad).get.group(1).toInt
      assert(badCount === 20, "limit=33 must clamp to the default 20")

      val (_, p0) = get(port, "/api/v1/webapp/transactions/list?address=0xA&limit=20&skip=0")
      val (_, p1) = get(port, "/api/v1/webapp/transactions/list?address=0xA&limit=20&skip=20")
      def ids(s: String) = """"event_id":(\d+)""".r.findAllMatchIn(s).map(_.group(1)).toSet
      assert(ids(p0).nonEmpty && ids(p1).nonEmpty)
      assert(ids(p0).intersect(ids(p1)).isEmpty, "pages must not overlap")
    }
  }

  test("transactions/last honors the token filter and newest-first order") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port,
        "/api/v1/webapp/transactions/last?address=0xA&token=RISKPRO")
      assert(status === 200)
      assert(body.contains(""""token_involved":"RISKPRO""""))
      assert(body.contains(""""created_at":"""))
    }
  }

  test("fastbtc/pegout returns pegout_requests for the address") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/api/v1/webapp/fastbtc/pegout?address=0xA")
      assert(status === 200)
      assert(body.startsWith("""{"pegout_requests":["""))
      assert(body.contains(""""type":"PEG_OUT""""))
    }
  }

  test("prices/var returns current and 24h-delta records") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/api/v1/webapp/prices/var")
      assert(status === 200)
      assert(body.startsWith("""{"current":{"""))
      assert(body.contains(""""delta":{"""))
    }
  }

  test("prices/ohlc serves the newest N daily candles, clamped") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/api/v1/webapp/prices/ohlc?days=5")
      assert(status === 200)
      assert(body.startsWith("""{"candles":["""))
      def nCandles(b: String) = b.sliding(7).count(_ == """"day":"""")
      assert(nCandles(body) === 5, s"expected 5 candles in $body")
      assert(body.contains(""""open":""") && body.contains(""""vwap":"""))
      // absent/garbage days falls back to the 30-day default
      val (s2, b2) = get(port, "/api/v1/webapp/prices/ohlc?days=oops")
      assert(s2 === 200 && nCandles(b2) <= 30)
    }
  }

  test("stats/freq serves live streaming CMS state; 404 when unwired") {
    import spark.implicits._
    // no sketch wired → 404
    withServer(minAddrLen = 3) { port =>
      assert(get(port, "/api/v1/webapp/stats/freq?tokens=x")._1 === 404)
    }
    // populate a sketch via the streaming merge body, then serve it
    val dir = java.nio.file.Files.createTempDirectory("srv-cms").toString + "/state"
    graft.streaming.SketchStream.mergeBatch(
      (Seq.fill(12)("alpha") ++ Seq.fill(3)("beta")).toDF("token"), dir, 0L)
    val srv = new graft.serving.ApiServer(spark, sf, minAddressLen = 3,
      sketchDir = Some(dir))
    val port = srv.start()
    try {
      val (status, body) = get(port,
        "/api/v1/webapp/stats/freq?tokens=alpha,beta,unseen-zzz")
      assert(status === 200)
      assert(body.startsWith("""{"freq":{"""))
      val freq = body.drop("""{"freq":{""".length).takeWhile(_ != '}')
        .split(',').map { kv =>
          val Array(k, v) = kv.split(":"); k.replace("\"", "") -> v.toLong
        }.toMap
      assert(freq("alpha") >= 12L && freq("beta") >= 3L)
      assert(freq.contains("unseen-zzz"))
    } finally srv.stop()
  }

  test("invalid addresses are rejected with 400 (lib_tools checkAddress)") {
    // faithful reference validation: min length 25, 0x prefix, hex body
    withServer(minAddrLen = 25) { port =>
      for (bad <- Seq("0xA7", "deadbeefdeadbeefdeadbeefdeadbeef",
          "0xZZZZZZZZZZZZZZZZZZZZZZZZZZZZ")) {
        val (status, _) = get(port,
          s"/api/v1/webapp/transactions/list?address=$bad")
        assert(status === 400, s"address $bad must be rejected")
      }
      val ok = "0x" + "a" * 40
      val (status, body) = get(port,
        s"/api/v1/webapp/transactions/list?address=$ok")
      assert(status === 200)
      assert(body.contains(""""total":0"""), "no synthetic address is 42 chars")
    }
  }

  test("health routes: / empty-200, /ping OK, unmapped paths 404 (bp_main)") {
    withServer(minAddrLen = 3) { port =>
      val (rootStatus, rootBody) = get(port, "/")
      assert(rootStatus === 200 && rootBody === "")
      val (pingStatus, pingBody) = get(port, "/ping")
      assert(pingStatus === 200 && pingBody === "webAppAPI OK")
      // trailing-slash variant, like the reference's dual @route
      assert(get(port, "/ping/")._1 === 200)
      assert(get(port, "/no/such/route")._1 === 404)
    }
  }

  test("infoapi serves the version/store-health doc (bp_main.infoabi)") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/infoapi")
      assert(status === 200)
      assert(body.contains(s""""webAppAPI":"${ApiServer.ApiVersion}""""))
      assert(body.contains(""""Spark":""") && body.contains(spark.version))
      assert(body.contains(""""DB_Collections_Ok":true"""),
        "all required tables exist under the sf0.001 dataset")
      assert(get(port, "/infoapi/")._1 === 200)
    }
  }

  test("stats/freq JSON-escapes keys so every token round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-esc").toString
    // ingest two tokens that a strip-based sanitizer would COLLIDE: a"b → ab
    import spark.implicits._
    graft.streaming.SketchStream.mergeBatch(
      Seq("a\"b", "ab", "ab", "back\\slash").toDF("token"), dir, 0L)
    val srv = new ApiServer(spark, sf, minAddressLen = 3, sketchDir = Some(dir))
    val port = srv.start()
    try {
      val q = java.net.URLEncoder.encode("a\"b,ab,back\\slash", "UTF-8")
      val (status, body) = get(port, s"/api/v1/webapp/stats/freq?tokens=$q")
      assert(status === 200)
      assert(body.contains(""""a\"b":1"""), s"escaped quote key in $body")
      assert(body.contains(""""ab":2"""), s"distinct ab key in $body")
      assert(body.contains(""""back\\slash":1"""), s"escaped backslash in $body")
    } finally srv.stop()
  }

  test("vectors/topk serves exact cosine neighbors from the quantized index") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/api/v1/webapp/vectors/topk?vec_id=0&k=3")
      assert(status === 200)
      assert(body.startsWith("""{"query":0,"mode":"exact","neighbors":["""), body.take(60))
      val cos = """"cos":(-?[0-9.E-]+)""".r.findAllMatchIn(body).map(_.group(1).toDouble).toSeq
      assert(cos.length === 3, s"expected 3 neighbors in $body")
      assert(cos.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"neighbors not cosine-descending in $body")
      // the serving answer must agree with the oracle-pinned ss_topk_brute
      // program for the same query vector (shared index, shared scorer)
      val expected = graft.core.QueryRegistry.byName("ss_topk_brute").fn(spark, sf)
        .filter(org.apache.spark.sql.functions.col("q_id") === 0)
        .orderBy(org.apache.spark.sql.functions.col("rnk"))
        .collect().take(3).map(r => (r.getLong(1), r.getDouble(2)))
      val served = """"vec_id":(\d+),"cos":(-?[0-9.E-]+)""".r.findAllMatchIn(body)
        .map(m => (m.group(1).toLong, m.group(2).toDouble)).toSeq
      assert(served === expected.toSeq,
        s"served neighbors differ from ss_topk_brute: $served vs ${expected.toSeq}")
      // unknown vector: total program, empty neighbor list
      val (s2, b2) = get(port, "/api/v1/webapp/vectors/topk?vec_id=99999999&k=3")
      assert(s2 === 200 && b2.endsWith(""""neighbors":[]}"""), b2)
      // malformed id: 400, like the address routes
      assert(get(port, "/api/v1/webapp/vectors/topk?vec_id=abc")._1 === 400)
    }
  }

  test("vectors/topk?mode=graph serves the beam walk over the persisted " +
    "k-NN graph and agrees with the oracle-pinned ss_graph_search program") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) =
        get(port, "/api/v1/webapp/vectors/topk?vec_id=3&k=5&mode=graph")
      assert(status === 200)
      assert(body.startsWith("""{"query":3,"mode":"graph","neighbors":["""),
        body.take(60))
      // query 3 sits in the registered fixed slice (vec_id < 16), so the
      // route must reproduce ss_graph_search's rows for q_id = 3 exactly
      // (same graph artifact, same GLOBAL seed rule, same beam program)
      val expected = graft.core.QueryRegistry.byName("ss_graph_search").fn(spark, sf)
        .filter(org.apache.spark.sql.functions.col("q_id") === 3)
        .orderBy(org.apache.spark.sql.functions.col("rnk"))
        .collect().map(r => r.getLong(1))
      val served = """"vec_id":(\d+)""".r.findAllMatchIn(body)
        .map(_.group(1).toLong).toSeq
      assert(served === expected.toSeq,
        s"graph route diverges from ss_graph_search: $served vs ${expected.toSeq}")
      // unknown vector: total program, empty neighbor list
      val (s2, b2) =
        get(port, "/api/v1/webapp/vectors/topk?vec_id=99999999&k=3&mode=graph")
      assert(s2 === 200 && b2.endsWith(""""neighbors":[]}"""), b2)
    }
  }

  test("search serves BM25 top-k from the postings index and agrees with " +
    "the oracle-pinned tx_bm25 program") {
    withServer(minAddrLen = 3) { port =>
      // workload query 1 is exactly the terms "hash join" — the served
      // route must reproduce the registered query's rows for q_id = 1
      val (status, body) = get(port, "/api/v1/webapp/search?q=hash+join&k=5")
      assert(status === 200)
      assert(body.startsWith("""{"query":["hash","join"],"results":["""), body.take(60))
      val served = """"doc_id":(\d+),"score":(\d+),"rnk":(\d+)""".r
        .findAllMatchIn(body).map(m =>
          (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)).toSeq
      val expected = graft.core.QueryRegistry.byName("tx_bm25").fn(spark, sf)
        .filter(org.apache.spark.sql.functions.col("q_id") === 1)
        .orderBy(org.apache.spark.sql.functions.col("rnk"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(served === expected,
        s"served results differ from tx_bm25 q1: $served vs $expected")
      // unknown terms: total program, empty result list
      val (s2, b2) = get(port, "/api/v1/webapp/search?q=zzzznotaword")
      assert(s2 === 200 && b2.endsWith(""""results":[]}"""), b2)
      // empty q: 400
      assert(get(port, "/api/v1/webapp/search?q=")._1 === 400)
      assert(get(port, "/api/v1/webapp/search")._1 === 400)
    }
  }

  test("images/similar serves perceptual neighbors and agrees with the " +
    "oracle-pinned mm_phash_rank program") {
    withServer(minAddrLen = 3) { port =>
      val (status, body) = get(port, "/api/v1/webapp/images/similar?img_id=0&k=3")
      assert(status === 200)
      assert(body.startsWith("""{"query":0,"similar":["""), body.take(60))
      val served = """"img_id":(\d+),"hamming":(\d+),"rnk":(\d+)""".r
        .findAllMatchIn(body).map(m =>
          (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)).toSeq
      val expected = graft.core.QueryRegistry.byName("mm_phash_rank").fn(spark, sf)
        .filter(org.apache.spark.sql.functions.col("img_id") === 0)
        .orderBy(org.apache.spark.sql.functions.col("rnk"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(served === expected,
        s"served neighbors differ from mm_phash_rank img 0: $served vs $expected")
      // unknown image: total, empty list; malformed id: 400
      val (s2, b2) = get(port, "/api/v1/webapp/images/similar?img_id=99999999")
      assert(s2 === 200 && b2.endsWith(""""similar":[]}"""), b2)
      assert(get(port, "/api/v1/webapp/images/similar?img_id=abc")._1 === 400)
    }
  }
}
