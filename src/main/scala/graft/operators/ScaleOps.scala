package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

/** Scale-engineering operator family — the pieces a 100 TB pipeline leans on
  * that are ABOUT distribution itself, not a specific domain query:
  *
  *  - `gr_pagerank`: bounded-iteration PageRank over the customer↔supplier
  *    order graph, INTEGER-EXACT (ranks are 10^12-scaled longs, every
  *    transfer uses integer division) so the DuckDB oracle reproduces the
  *    fixpoint bit-for-bit. Each iteration is one keyed shuffle (contrib by
  *    dst) over a persisted, pre-weighted edge table; ranks are
  *    localCheckpoint'd per iteration so the 6-round loop never builds a
  *    nested mega-plan (same discipline as the BPE/perceptron loops).
  *  - `lo_zorder`: Z-order (Morton) storage-layout planning over the events
  *    table — interleaves the bits of the user_id and time dimensions and
  *    buckets rows into 16 z-range files, reporting each file's min/max in
  *    BOTH dimensions. This is the layout step that makes two-column skip
  *    pruning work at 100 TB (each z-file covers at most a quarter of each
  *    dimension's range, so a predicate on either column prunes ~75% of
  *    files); the interleave is a pure narrow map generated from one
  *    bit-spec into both engines' dialects.
  *  - `tx_weighted_sample`: deterministic weighted sampling WITHOUT
  *    replacement over documents via a unit-replica min-hash race: each doc
  *    enters ceil(n_chars/64) (≤16) unit replicas, each replica gets an
  *    md5-derived 60-bit key, the doc's key is the minimum, and the sample
  *    is the k smallest keys. P(doc wins the first slot) is EXACTLY
  *    w/Σw under hash uniformity — the integer-only analog of the
  *    Efraimidis–Spirtakis u^(1/w) scheme (whose pow() is not
  *    cross-engine-exact). Row-local key computation (no explode, no
  *    shuffle), then a global top-k.
  *  - `a7_quantile_sketch`: fixed-bin histogram quantile estimation over
  *    events.value per event_type, with the EXACT per-quantile answer
  *    computed beside it (the `ss_recall`/CMS eval pattern: the sketch is
  *    the 100 TB path — one map-side-combining shuffle over (type, bin) —
  *    and the exact rank-select is the small-scale referee that pins the
  *    estimator's error ≤ 1 bin width).
  *
  * Reference anchors: the indexer keeps per-address running aggregates and
  * top-N report queries (reference `reports.py`, `bp_user_operations.py`)
  * — the graph/layout/sample/sketch family generalizes those shapes to the
  * sizes where exact global passes stop being an option.
  */
object ScaleOps {

  /** 60-bit deterministic string id (md5 prefix) — same convention as
    * TextOps/QualityOps; DuckDB mirror: CAST('0x'||substr(md5(s),1,15) AS BIGINT). */
  private def sid60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
  private def sid60Sql(e: String): String =
    s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  // ── PageRank parameters ────────────────────────────────────────────────
  private val PrScale = 1000000000000L // 10^12 rank scale
  private val PrIters = 6
  // damping 0.85 as the integer pair (85, 100)

  /** Directed edge table of the bipartite customer↔supplier graph: node id
    * namespacing 2·custkey / 2·suppkey+1, both directions, weight = number
    * of lineitems linking the pair, with each src's total out-weight
    * denormalized onto the edge so a transfer is a single integer-division
    * expression. Persisted by callers — every iteration re-reads it. */
  private def prEdges(s: SparkSession, d: String): DataFrame = {
    val pair = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .agg(count(lit(1)).as("w"))
    val fwd = pair.select((col("c") * 2).as("src"), (col("sp") * 2 + 1).as("dst"), col("w"))
    val bwd = pair.select((col("sp") * 2 + 1).as("src"), (col("c") * 2).as("dst"), col("w"))
    val edges = fwd.unionAll(bwd)
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    edges.join(outw, Seq("src"))
  }

  /** One PageRank sweep: contrib keyed by dst (the iteration's only
    * shuffle), then the damped update against the full node set.
    *
    * Join shape (round 15, guide §2.4/§3.1): the edge table is persisted
    * ALREADY hash-partitioned by src (the caller repartitions once), so
    * the transfer join needs no exchange on the |E|-sized side — only the
    * |V|-sized ranks frame moves, and the SHUFFLE_HASH hints keep both
    * joins off the sort-merge path (an SMJ would re-SORT the persisted
    * edge partitions every sweep; a hash build of the small ranks/contrib
    * side does not). Before the re-cut each sweep sort-merge-joined the
    * edges — two sorts plus an |E| exchange per iteration at 100 TB.
    * Strategy-only change: the summed integer transfers are identical
    * under any join order (exact Long arithmetic, no overflow at the
    * 10^12 scale × degree bound), so the fixpoint is bit-identical. */
  private def prStep(nodes: DataFrame, edges: DataFrame, ranks: DataFrame,
      base: Long, broadcastRanks: Boolean): DataFrame = {
    // the |V|-sized ranks frame is broadcast while it provably fits (the
    // caller knows n — the size-capped conditional-hint pattern mergeLabels
    // uses) and falls back to a shuffled hash build past the cap, so the
    // sweep never sort-merge-joins the persisted |E| side either way
    val rside =
      if (broadcastRanks) ranks.hint("broadcast") else ranks.hint("shuffle_hash")
    val contrib = edges.join(rside, edges("src") === ranks("id"))
      .groupBy(col("dst").as("id"))
      .agg(sum(expr("(r * w) div wout")).as("c"))
    nodes.join(contrib.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"),
        (lit(base) + expr("(85 * coalesce(c, 0L)) div 100")).as("r"))
  }

  private def pagerankOracle: String = {
    val head =
      s"""WITH pair AS (
         |  SELECT o_custkey AS c, l_suppkey AS sp, count(*) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT 2*c AS src, 2*sp+1 AS dst, w FROM pair
         |  UNION ALL SELECT 2*sp+1, 2*c, w FROM pair),
         |outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY src),
         |ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
         |n AS (SELECT count(*) AS n FROM nodes),
         |base AS (SELECT CAST((15 * ${PrScale}) // (100 * n) AS BIGINT) AS b FROM n),
         |r0 AS MATERIALIZED (SELECT id, CAST(${PrScale} // (SELECT n FROM n) AS BIGINT) AS r FROM nodes)""".stripMargin
    val iters = (1 to PrIters).map { k =>
      s"""c$k AS (SELECT e.dst AS id, CAST(sum((r.r * e.w) // e.wout) AS BIGINT) AS c
         |  FROM ew e JOIN r${k - 1} r ON e.src = r.id GROUP BY e.dst),
         |r$k AS MATERIALIZED (SELECT nd.id,
         |    CAST((SELECT b FROM base) + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes nd LEFT JOIN c$k c USING (id))""".stripMargin
    }
    val tail =
      s"""SELECT id AS node_id,
         |  CASE WHEN id % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
         |  id // 2 AS entity_key, r AS rank
         |FROM r$PrIters ORDER BY rank DESC, node_id LIMIT 20""".stripMargin
    (head +: iters).mkString(",\n") + "\n" + tail
  }

  // ── Z-order parameters: 8 bits per dimension, 16 output files ──────────
  private val ZBits = 8
  private val ZFiles = 16

  /** Morton interleave of two ZBits-wide bucket columns, emitted from one
    * bit-spec into a dialect: bx occupies the odd bit positions, by the
    * even ones. `shl(e, n)` abstracts Spark's shiftleft() vs DuckDB's <<. */
  private def zExpr(bx: String, by: String, shl: (String, Int) => String,
      shr: (String, Int) => String): String =
    (0 until ZBits).flatMap { j =>
      Seq(shl(s"(${shr(bx, j)} & 1)", 2 * j + 1), shl(s"(${shr(by, j)} & 1)", 2 * j))
    }.mkString(" + ")

  private def zSpark(bx: String, by: String): String =
    zExpr(bx, by, (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")
  private def zSql(bx: String, by: String): String =
    zExpr(bx, by, (e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")

  // ── bucketed-layout parameters ─────────────────────────────────────────
  private val BktN = 8

  /** One-time bucketed layout write, memoized per (session, dataset): the
    * purchase legs and the view/click legs of `events` land in the session
    * warehouse as parquet tables `bucketBy(8, user_id)` — ONE file per
    * bucket (repartition on the same hash the bucketer uses, so each write
    * task holds exactly its bucket). This is the storage decision that
    * buys co-located joins at 100 TB: both tables agree on the hash
    * partitioning AT REST, so every later user_id join/aggregation between
    * them needs NO exchange — the shuffle was paid once, at layout time,
    * not per query. The memo makes queries measure the co-located read
    * path, not the layout write (same discipline as classifierState). */
  private val bktCache = new graft.core.SessionCache[(String, String)]()
  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    bktCache.get(s, d) {
      {
        // INJECTIVE table tag: sanitizing alone maps e.g. `sf0.1` and
        // `sf0_1` to the same name, and the second build would silently
        // drop and rewrite the first dataset's tables while its cache
        // entry still points at them — append a hash of the raw path so
        // distinct datasets can never share tables.
        val tag = d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          java.lang.Integer.toHexString(
            java.util.Arrays.hashCode(d.getBytes("UTF-8")))
        val buy = s"graft_bkt_buy_$tag"
        val vw = s"graft_bkt_view_$tag"
        // the warehouse DIRECTORY outlives the in-memory catalog (a prior
        // JVM's table data stays on disk while the new session's catalog
        // starts empty) — drop both the entry and the leftover location,
        // or saveAsTable fails with LOCATION_ALREADY_EXISTS
        Seq(buy, vw).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val wh = s.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:").stripPrefix("//")
          val loc = java.nio.file.Paths.get(wh, t)
          if (java.nio.file.Files.exists(loc)) {
            import scala.jdk.CollectionConverters.IteratorHasAsScala
            scala.util.Using.resource(java.nio.file.Files.walk(loc)) { st =>
              st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .iterator().asScala.foreach(java.nio.file.Files.delete)
            }
          }
        }
        val ev = T.events(s, d)
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("value"))
          .repartition(BktN, col("user_id"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(BktN, "user_id").sortBy("user_id").saveAsTable(buy)
        ev.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("event_id"))
          .repartition(BktN, col("user_id"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(BktN, "user_id").sortBy("user_id").saveAsTable(vw)
        (buy, vw)
      }
    }

  /** cold-build hook: force the memoized bucketed layout write so the
    * bench's artifact pass can time it in isolation (core.ColdBuilds). */
  private[graft] def buildBucketedTables(s: SparkSession, d: String): Unit = {
    bucketedTables(s, d); ()
  }

  // ── weighted-sample parameters ─────────────────────────────────────────
  private val WsUnit = 64  // one replica per 64 chars
  private val WsCap  = 16  // replica cap per doc
  private val WsK    = 10  // sample size

  // ── quantile-sketch parameters: unit-width bins, {p50, p90, p99} ───────
  private val Quantiles = Seq(50, 90, 99)

  def queries: Seq[Q] = Seq(

    Q("gr_pagerank", pagerankOracle) { (s, d) =>
      // persist the edge table hash-partitioned by src: all 6 sweeps join
      // on src, so the partitioning is paid once here instead of being
      // re-established (or sorted around) inside every iteration
      val edges = prEdges(s, d).repartition(col("src")).persist()
      val nodes = edges.select(col("src").as("id")).distinct().persist()
      val n = nodes.count()
      val base = (15L * PrScale) / (100L * n)
      // Per-iteration localCheckpoint is the MEASURED winner: letting all
      // 6 sweeps plan as one deep chained job looked cheaper on paper (one
      // scheduler round-trip instead of six) but benched 6.7 s vs 3.8 s at
      // sf0.1 — the 6-deep join/agg lineage blows up plan size and codegen
      // while the checkpointed form keeps each sweep a small warm plan.
      // Don't "optimize" the checkpoints away without re-measuring.
      var ranks = nodes.select(col("id"), lit(PrScale / n).as("r")).localCheckpoint()
      // 4M-node broadcast cap: ~64 MB of (id, rank) pairs — the same
      // ceiling mergeLabels uses for its conditional broadcast
      for (_ <- 1 to PrIters)
        ranks = prStep(nodes, edges, ranks, base,
          broadcastRanks = n <= 4000000L).localCheckpoint()
      val out = ranks
        .select(col("id").as("node_id"),
          when(col("id") % 2 === 0, "cust").otherwise("supp").as("kind"),
          expr("id div 2").as("entity_key"),
          col("r").as("rank"))
        .orderBy(col("rank").desc, col("node_id"))
        .limit(20)
      // localCheckpoint, not cache(): the 20-row head must be materialized
      // before the loop inputs unpersist, but a cache() would outlive the
      // query in the session CacheManager (cache-hygiene rule)
      val collected = out.localCheckpoint(eager = true)
      edges.unpersist(); nodes.unpersist()
      collected
    },

    Q(
      "lo_zorder", {
        val zc = zSql("bx", "by")
        s"""WITH b AS (SELECT min(user_id) AS minu, max(user_id) AS maxu,
           |    min(epoch_us(ts)) AS mint, max(epoch_us(ts)) AS maxt FROM events),
           |g AS (SELECT e.user_id, e.ts,
           |    CAST(((e.user_id - b.minu) * 256) // (b.maxu - b.minu + 1) AS BIGINT) AS bx,
           |    CAST(((epoch_us(e.ts) - b.mint) * 256) // (b.maxt - b.mint + 1) AS BIGINT) AS by
           |  FROM events e, b),
           |z AS (SELECT user_id, ts, ($zc) // 4096 AS file_id FROM g)
           |SELECT file_id, count(*) AS n,
           |  min(user_id) AS min_uid, max(user_id) AS max_uid,
           |  min(ts) AS min_ts, max(ts) AS max_ts
           |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin
      }) { (s, d) =>
      val ev = T.events(s, d)
      val bounds = ev.agg(
        min(col("user_id")).as("minu"), max(col("user_id")).as("maxu"),
        min(unix_micros(col("ts"))).as("mint"), max(unix_micros(col("ts"))).as("maxt"))
      ev.select(col("user_id"), col("ts"))
        .crossJoin(broadcast(bounds))
        .withColumn("bx", expr("((user_id - minu) * 256) div (maxu - minu + 1)"))
        .withColumn("by", expr(s"((unix_micros(ts) - mint) * 256) div (maxt - mint + 1)"))
        .withColumn("file_id", expr(s"(${zSpark("bx", "by")}) div 4096"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).as("min_uid"), max(col("user_id")).as("max_uid"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
        .orderBy(col("file_id"))
    },

    Q(
      "tx_weighted_sample",
      s"""WITH w AS (SELECT doc_id, n_chars,
         |    least(CAST(ceil(CAST(n_chars AS DOUBLE) / $WsUnit) AS BIGINT), $WsCap) AS weight
         |  FROM documents),
         |keyed AS (SELECT doc_id, n_chars, weight,
         |    list_min(list_transform(range(1, CAST(weight AS INTEGER) + 1),
         |      j -> ${sid60Sql(s"concat('ws:', CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))")})) AS rkey
         |  FROM w)
         |SELECT doc_id, n_chars, weight, rkey,
         |  ROW_NUMBER() OVER (ORDER BY rkey, doc_id) AS rnk
         |FROM keyed ORDER BY rkey, doc_id LIMIT $WsK""".stripMargin) { (s, d) =>
      val keyed = T.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          least(ceil(col("n_chars").cast(DoubleType) / WsUnit).cast(LongType), lit(WsCap.toLong))
            .as("weight"))
        .withColumn("rkey", array_min(transform(
          sequence(lit(1), col("weight").cast(IntegerType)),
          j => sid60(concat(lit("ws:"), col("doc_id").cast(StringType), lit(":"), j.cast(StringType))))))
      // distributed top-k FIRST (TakeOrdered — no single-partition pass over
      // the corpus), then the rank window runs over only the k winners.
      keyed.orderBy(col("rkey"), col("doc_id")).limit(WsK)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("rkey"), col("doc_id"))).cast(LongType))
        .select(col("doc_id"), col("n_chars"), col("weight"), col("rkey"), col("rnk"))
    },

    Q(
      "a7_quantile_sketch", {
        val ks = Quantiles.map(q => s"(($q * n) + 99) // 100 AS k$q").mkString(", ")
        val ests = Quantiles.map(q =>
          s"CAST(min(CASE WHEN h.cum >= t.k$q THEN h.bin END) + 1 AS DOUBLE) AS est_p$q").mkString(",\n|  ")
        val exs = Quantiles.map(q =>
          s"max(CASE WHEN r.rn = t.k$q THEN r.value END) AS ex_p$q").mkString(",\n|  ")
        s"""WITH t AS (SELECT event_type, count(*) AS n, $ks FROM events GROUP BY event_type),
           |h0 AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS bin, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |h AS (SELECT event_type, bin,
           |    sum(c) OVER (PARTITION BY event_type ORDER BY bin
           |                 ROWS UNBOUNDED PRECEDING) AS cum FROM h0),
           |r AS (SELECT event_type, value, event_id,
           |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
           |  FROM events),
           |est AS (SELECT t.event_type, t.n, $ests
           |  FROM t JOIN h ON t.event_type = h.event_type GROUP BY t.event_type, t.n),
           |ex AS (SELECT t.event_type, $exs
           |  FROM t JOIN r ON t.event_type = r.event_type GROUP BY t.event_type)
           |SELECT est.event_type, est.n,
           |  est.est_p50, ex.ex_p50, est.est_p90, ex.ex_p90, est.est_p99, ex.ex_p99
           |FROM est JOIN ex ON est.event_type = ex.event_type
           |ORDER BY est.event_type""".stripMargin
      }) { (s, d) =>
      val ev = T.events(s, d)
      val t = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .select(Seq(col("event_type"), col("n")) ++
          Quantiles.map(q => expr(s"(($q * n) + 99) div 100").as(s"k$q")): _*)
      val h0 = ev.groupBy(col("event_type"), floor(col("value")).cast(LongType).as("bin"))
        .agg(count(lit(1)).as("c"))
      val h = h0.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val est = t.join(h, Seq("event_type"))
        .groupBy(col("event_type"), col("n"))
        .agg(
          Quantiles.map(q =>
            (min(when(col("cum") >= col(s"k$q"), col("bin"))) + 1).cast(DoubleType).as(s"est_p$q"))
            .head,
          Quantiles.map(q =>
            (min(when(col("cum") >= col(s"k$q"), col("bin"))) + 1).cast(DoubleType).as(s"est_p$q"))
            .tail: _*)
      val r = ev.select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))))
      val ex = t.join(r, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          Quantiles.map(q => max(when(col("rn") === col(s"k$q"), col("value"))).as(s"ex_p$q")).head,
          Quantiles.map(q => max(when(col("rn") === col(s"k$q"), col("value"))).as(s"ex_p$q")).tail: _*)
      est.join(ex, Seq("event_type"))
        .select(col("event_type"), col("n"),
          col("est_p50"), col("ex_p50"), col("est_p90"), col("ex_p90"),
          col("est_p99"), col("ex_p99"))
        .orderBy(col("event_type"))
    },

    // DETERMINISTIC HyperLogLog — the sketch construction that also powers
    // a1b_approx_distinct (Spark's built-in HLL++ sketch internals aren't
    // reproducible in SQL; this one is). It is exact-comparable end to end: register index/rank come from the
    // md5-derived 60-bit hash, the rank is a BIT LENGTH (length(bin(x)) —
    // an integer both engines compute identically; no log2 anywhere), the
    // harmonic-mean denominator Σ2^(62−M(j)) accumulates EXACTLY in
    // 128-bit integers (every term is a power of two that fits a long
    // after the ÷4 rescale), and the final estimate is a fixed chain of
    // correctly-rounded double ops on identical operands. Raw-range
    // formula only (n ≫ 2.5m at verify scale, so the small-range branch
    // — whose ln() is NOT cross-engine exact — never triggers; m=64 →
    // ~13% expected error, demonstrated against the exact count beside
    // it). Scale shape: one (type, j) shuffle over ≤64·|types| keys.
    Q(
      "a13_hll_sketch",
      """WITH h AS (
        |  SELECT event_type,
        |    CAST('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,15) AS BIGINT) AS h60
        |  FROM events),
        |r AS (
        |  SELECT event_type, h60 % 64 AS j,
        |    CASE WHEN h60 // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h60 // 64)) END AS rho
        |  FROM h),
        |m AS (SELECT event_type, j, max(rho) AS mj FROM r GROUP BY 1, 2),
        |s AS (SELECT event_type,
        |    sum(CAST(CAST(1 AS BIGINT) << CAST(62 - mj AS INT) AS HUGEINT))
        |      + (64 - count(*)) * CAST(4611686018427387904 AS HUGEINT) AS s4
        |  FROM m GROUP BY 1),
        |x AS (SELECT event_type, count(DISTINCT event_id) AS n_exact FROM events GROUP BY 1)
        |SELECT s.event_type, x.n_exact,
        |  (CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)
        |    / CAST(s4 AS DOUBLE) AS hll_estimate
        |FROM s JOIN x USING (event_type) ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = T.events(s, d)
      val h = ev.select(col("event_type"),
        conv(substring(md5(col("event_id").cast(StringType)), 1, 15), 16, 10)
          .cast(LongType).as("h60"))
      val r = h.select(col("event_type"), expr("h60 % 64").as("j"),
        when(expr("h60 div 64") === 0, 55)
          .otherwise(lit(55) - length(bin(expr("h60 div 64")))).as("rho"))
      val m = r.groupBy(col("event_type"), col("j")).agg(max(col("rho")).as("mj"))
      val s4 = m.groupBy(col("event_type")).agg(
        (sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(62 - mj AS INT)) AS DECIMAL(38,0))"))
          + (lit(64) - count(lit(1))).cast(DecimalType(38, 0))
            * lit(4611686018427387904L).cast(DecimalType(38, 0))).as("s4"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n_exact"))
      s4.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          expr("(CAST(0.7213 AS DOUBLE)/(1 + CAST(1.079 AS DOUBLE)/64)) * 4096 * CAST(4611686018427387904 AS DOUBLE)" +
            " / CAST(s4 AS DOUBLE)").as("hll_estimate"))
        .orderBy(col("event_type"))
    },

    // Z-order pruning EFFECTIVENESS — the measurement that justifies
    // lo_zorder's existence, computed from the layout manifests alone (at
    // 100 TB this is exactly the planner's file-skipping arithmetic: no
    // data is read, only per-file min/max stats): for a user-only
    // predicate the time-linear layout scans ALL files (its min/max on the
    // non-sort dimension are vacuous) while the z-layout prunes ~half;
    // for user+time both layouts prune to the time slice. Both manifests
    // come out of ONE scan (union of the two file assignments, grouped
    // once); the verdict table is 4 rows of manifest arithmetic.
    Q(
      "lo_zorder_prune", {
        val zc = zSql("user_bits", "time_bits")
        s"""WITH b AS (SELECT min(user_id) AS minu, max(user_id) AS maxu,
           |    min(epoch_us(ts)) AS mint, max(epoch_us(ts)) AS maxt FROM events),
           |g AS (SELECT e.user_id, epoch_us(e.ts) AS tus,
           |    CAST(((e.user_id - b.minu) * 256) // (b.maxu - b.minu + 1) AS BIGINT) AS user_bits,
           |    CAST(((epoch_us(e.ts) - b.mint) * 256) // (b.maxt - b.mint + 1) AS BIGINT) AS time_bits,
           |    b.mint, b.maxt
           |  FROM events e, b),
           |zf AS (SELECT 'zorder' AS layout, ($zc) // 4096 AS file_id, user_id, tus FROM g),
           |lf AS (SELECT 'linear' AS layout, ((tus - mint) * 16) // (maxt - mint + 1) AS file_id, user_id, tus FROM g),
           |m AS (SELECT layout, file_id, min(user_id) AS mnu, max(user_id) AS mxu,
           |      min(tus) AS mnt, max(tus) AS mxt, count(*) AS n
           |  FROM (SELECT * FROM zf UNION ALL SELECT * FROM lf) GROUP BY 1, 2),
           |pred AS (SELECT mint + (maxt - mint) * 10 // 30 AS plo,
           |    mint + (maxt - mint) * 13 // 30 AS phi FROM b)
           |SELECT layout, p.pname, count(*) AS n_files,
           |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           |  CAST(sum(CASE WHEN hit THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
           |FROM (
           |  SELECT m.*, 'user_only' AS pname, (mxu >= 40 AND mnu <= 75) AS hit FROM m
           |  UNION ALL
           |  SELECT m.*, 'user_and_time', (mxu >= 40 AND mnu <= 75 AND mxt >= pr.plo AND mnt <= pr.phi)
           |  FROM m, pred pr) p
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }) { (s, d) =>
      val ev = T.events(s, d)
      val bounds = ev.agg(
        min(col("user_id")).as("minu"), max(col("user_id")).as("maxu"),
        min(unix_micros(col("ts"))).as("mint"), max(unix_micros(col("ts"))).as("maxt"))
      val g = ev.select(col("user_id"), unix_micros(col("ts")).as("tus"))
        .crossJoin(broadcast(bounds))
        .withColumn("user_bits", expr("((user_id - minu) * 256) div (maxu - minu + 1)"))
        .withColumn("time_bits", expr("((tus - mint) * 256) div (maxt - mint + 1)"))
      val zf = g.select(lit("zorder").as("layout"),
        expr(s"(${zSpark("user_bits", "time_bits")}) div 4096").as("file_id"),
        col("user_id"), col("tus"), col("mint"), col("maxt"))
      val lf = g.select(lit("linear").as("layout"),
        expr("((tus - mint) * 16) div (maxt - mint + 1)").as("file_id"),
        col("user_id"), col("tus"), col("mint"), col("maxt"))
      val m = zf.unionAll(lf)
        .groupBy(col("layout"), col("file_id"))
        .agg(min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
          min(col("tus")).as("mnt"), max(col("tus")).as("mxt"),
          count(lit(1)).as("n"))
      val pred = bounds.select(
        expr("mint + (maxt - mint) * 10 div 30").as("plo"),
        expr("mint + (maxt - mint) * 13 div 30").as("phi"))
      val userHit = col("mxu") >= 40 && col("mnu") <= 75
      val both = m.select(col("*"), lit("user_only").as("pname"),
          userHit.as("hit"))
        .unionAll(m.crossJoin(broadcast(pred))
          .select(col("layout"), col("file_id"), col("mnu"), col("mxu"),
            col("mnt"), col("mxt"), col("n"), lit("user_and_time").as("pname"),
            (userHit && col("mxt") >= col("plo") && col("mnt") <= col("phi")).as("hit")))
      both.groupBy(col("layout"), col("pname"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("files_scanned"),
          sum(when(col("hit"), col("n")).otherwise(0L)).as("rows_scanned"))
        .orderBy(col("layout"), col("pname"))
    },

    // Bucketed CO-LOCATED join — the other half of the storage-layout
    // story (lo_zorder skips FILES on read; bucketing skips the SHUFFLE on
    // join): the purchase and view legs of events live at rest as
    // bucketBy(8, user_id) parquet tables (one-time memoized write,
    // [[bucketedTables]]), so the per-user aggregate on EACH side and the
    // user_id merge join between them all run with ZERO hash-partitioning
    // exchanges — the scan's bucket spec already satisfies every
    // clustering requirement downstream. At 100 TB this is the difference
    // between re-shuffling two fact tables on every join and paying the
    // partitioning once at ingest; PlanSpec pins the exchange-free plan
    // (the only exchange is the final presentation orderBy). The merge
    // hint keeps the demo on the SMJ path that bucketing accelerates
    // (AQE would otherwise broadcast the toy-scale side).
    Q(
      "lo_bucketed_join",
      """WITH b AS (SELECT user_id, count(*) AS n_purchases,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |v AS (SELECT user_id, count(*) AS n_views
        |  FROM events WHERE event_type IN ('view','click') GROUP BY 1)
        |SELECT b.user_id, b.n_purchases, b.purchase_value, v.n_views
        |FROM b JOIN v USING (user_id) ORDER BY b.user_id""".stripMargin) { (s, d) =>
      val (buyT, vwT) = bucketedTables(s, d)
      val buys = s.table(buyT).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 4)))
            .cast(DecimalType(38, 4)).cast(DoubleType).as("purchase_value"))
      val views = s.table(vwT).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"))
      buys.hint("merge").join(views, Seq("user_id"))
        .select(col("user_id"), col("n_purchases"), col("purchase_value"),
          col("n_views"))
        .orderBy(col("user_id"))
    },

    // Triangle counting over the part co-purchase graph — the degree-ordered
    // wedge-join algorithm ("compact-forward"/node-iterator++), the shape
    // that keeps triangle enumeration tractable at 100 TB: orient every
    // edge from its (degree, id)-smaller endpoint, form wedges only at
    // out-edges (out-degree is O(√m) under this orientation, so wedge
    // volume is Σ C(outdeg,2) — bounded even at hub nodes where the naive
    // neighbor join squares), then close each wedge with ONE equi-join
    // against the id-canonical edge set (the textbook OR-condition close
    // would plan a nested-loop join; canonicalizing by id makes it a hash
    // join). Graph build is itself scale-safe: co-occurrence pairs are
    // per-order bounded (≤C(7,2)), and the weight-≥2 support filter keeps
    // the edge set at the true co-purchase structure instead of the random
    // background. Every triangle is found exactly once, at its
    // (degree, id)-minimum vertex.
    Q(
      "gr_triangles",
      """WITH co AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM co a JOIN co b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS dg FROM (
        |  SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (du.dg, e0.u) < (dv.dg, e0.v) THEN e0.u ELSE e0.v END AS s,
        |         CASE WHEN (du.dg, e0.u) < (dv.dg, e0.v) THEN e0.v ELSE e0.u END AS t
        |  FROM e0 JOIN deg du ON du.n = e0.u JOIN deg dv ON dv.n = e0.v),
        |ec AS (SELECT least(s, t) AS x, greatest(s, t) AS y FROM o),
        |tri AS (
        |  SELECT w.a, w.b, w.c
        |  FROM (SELECT e1.s AS a, least(e1.t, e2.t) AS b, greatest(e1.t, e2.t) AS c
        |        FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t) w
        |  JOIN ec ON ec.x = w.b AND ec.y = w.c)
        |SELECT n AS partkey, count(*) AS n_tri FROM (
        |  SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri UNION ALL SELECT c AS n FROM tri)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // co-purchase pairs via ONE orderkey aggregation + in-row pair
      // expansion (the dd_ngram_jaccard pattern; round 15, guide §2.3/§2.4):
      // collect_set dedups (orderkey, partkey) in the same shuffle that
      // groups the order, and the ≤C(7,2) pairs per order are expanded
      // inside the row. The previous self-join re-shuffled the distinct
      // table twice on orderkey and streamed the 2·|pairs| join output
      // into the (u, v) aggregation — two corpus exchanges and a join for
      // what one grouped pass computes. Identical e0: each order
      // contributes each unordered part pair exactly once either way.
      val e0 = T.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, x -> filter(transform(ps, y -> struct(x AS u, y AS v)), p -> p.u < p.v)))"))
          .as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2).drop("w")
      val deg = e0.select(col("u").as("n")).unionAll(e0.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      val uLt = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
      val o = e0
        .join(deg.select(col("n").as("u"), col("dg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("dg").as("dv")), Seq("v"))
        .select(when(uLt, col("u")).otherwise(col("v")).as("s"),
          when(uLt, col("v")).otherwise(col("u")).as("t"))
        .persist()
      val wedges = o.as("e1").join(o.as("e2"),
          col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
        .select(col("e1.s").as("a"),
          least(col("e1.t"), col("e2.t")).as("b"),
          greatest(col("e1.t"), col("e2.t")).as("c"))
      val ec = o.select(least(col("s"), col("t")).as("b"),
        greatest(col("s"), col("t")).as("c"))
      val tri = wedges.join(ec, Seq("b", "c"))
      // materialize the bounded per-part result eagerly so the oriented
      // edge cache can be RELEASED here instead of accumulating across a
      // full registry run
      val out = tri.select(col("a").as("n"))
        .unionAll(tri.select(col("b").as("n")))
        .unionAll(tri.select(col("c").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("n_tri"))
        .select(col("n").as("partkey"), col("n_tri"))
        .orderBy(col("partkey"))
        .localCheckpoint(eager = true)
      o.unpersist()
      out
    }
  )
}
