package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}
import graft.plans.{RollingHash, RollingMinHashExpr, WinnowExpr}

/** the fixed BM25 query workload (tx_bm25): (q_id, term) — ONE Scala
  * literal drives both the Spark query table and the oracle's VALUES list,
  * so the two engines can never disagree on the workload. */
private object Bm25Workload {
  val Queries: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join",
    2L -> "window", 2L -> "agg", 2L -> "group",
    3L -> "fast", 3L -> "scan", 3L -> "filter",
    4L -> "stream", 4L -> "batch", 4L -> "merge")
  val Sql: String =
    Queries.map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")
}

/** Training-data text pipeline operators — SURVEY.md §7.4 extension surface
  * (beyond reference parity): tokenization, quality scoring, language-ID,
  * fingerprinting, and the deduplication family (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash) over the `documents` table.
  *
  * Scale design (100 TB):
  *  - every per-document derivation (tokens, fingerprints, signatures) is a
  *    narrow map — no shuffle until the candidate-pair stage;
  *  - candidate generation never does an all-pairs join on raw text: exact
  *    dedup shuffles on a 128-bit fingerprint, MinHash shuffles on LSH band
  *    keys, SimHash on pigeonhole bit-blocks, Jaccard on
  *    document-frequency-capped shingles. Each bounds the join fan-out by
  *    construction (band width / block width / df cap) — the standard
  *    web-scale dedup shape;
  *  - there is NO global sort and NO driver-side dictionary anywhere:
  *    token/shingle ids come from an md5-prefix hash (identical in DuckDB
  *    for the oracle; swap for xxhash64 in a production profile — same plan,
  *    cheaper hash);
  *  - MinHash signatures are computed as ONE wide aggregation (16 `min`
  *    columns in a single groupBy(doc_id) with map-side partial agg), not a
  *    16× row explode; SimHash likewise as 60 signed sums in one pass.
  */
object TextOps {

  private[operators] val Stop = Seq("the", "a", "of", "to", "and", "in", "is")
  private[operators] def stopList: String = Stop.map(s => s"'$s'").mkString("array(", ",", ")")
  private[operators] def stopListSql: String = Stop.map(s => s"'$s'").mkString("[", ",", "]")

  /** the composite quality score — ONE definition (per engine) shared by
    * tx_quality, tx_curation's quality gate, and QualityOps' selection
    * operators, so the weights/stoplist can never drift between them. The
    * argument is the space-split token-array column name; the IEEE
    * expression tree is identical on both engines (exact compare-safe). */
  private[operators] def qualityScore(l: String): Column =
    lit(0.4) * (size(array_distinct(col(l))).cast(DoubleType) / size(col(l))) +
      lit(0.4) * (lit(1.0) -
        expr(s"size(filter($l, t -> array_contains($stopList, t)))").cast(DoubleType)
          / size(col(l))) +
      lit(0.2) * least(size(col(l)).cast(DoubleType) / 100.0, lit(1.0))

  /** the same score as DuckDB SQL over token-list expression `l`. */
  private[operators] def qualityScoreSql(l: String): String =
    s"0.4*(CAST(len(list_distinct($l)) AS DOUBLE)/len($l)) " +
      s"+ 0.4*(1.0 - CAST(len(list_filter($l, t -> list_contains($stopListSql, t))) AS DOUBLE)/len($l)) " +
      s"+ 0.2*least(CAST(len($l) AS DOUBLE)/100.0, 1.0)"

  /** normalized text: lower, trim, collapse whitespace — the canonical form
    * every fingerprint/dedup query keys on. */
  private def norm(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** 60-bit deterministic string id: first 15 hex chars of md5, as a long.
    * Same value in DuckDB via CAST('0x'||substr(md5(s),1,15) AS BIGINT). */
  private def sid60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
  private def sid60Sql(e: String): String =
    s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  // ── MinHash parameters: K=16 permutations h_k(x) = (x*(31k+7) + (17k+3))
  //    mod P over md5-derived shingle ids, 4 bands × 4 rows. ──
  private val MhK = 16
  private val MhP = 1000003L
  private val MhBands = 4

  // ── SimHash parameters (re-banded round 15): 60-bit signature — the
  //    FULL width of the md5-derived sid60 token hash, every signature
  //    bit backed by an independent hash bit — near-dup iff hamming <= 4;
  //    candidates from 4 pigeonhole 15-bit blocks (32,768 buckets per
  //    block, 8× the r14 12-bit space whose FIXED 4,096-bucket occupancy
  //    grew linearly with the corpus and made candidate pairs ~N²/4096 —
  //    the registry's one superlinear row at 8×/64×). Completeness: ≤3
  //    differing bits across 4 disjoint blocks leave at least one block
  //    identical (exact, the pigeonhole argument); hamming-4 pairs match
  //    iff all four flips avoid one block (~91% for spread flips) — the
  //    same candidates-are-probabilistic contract as dd_minhash_lsh's
  //    banding, and dd_simhash_recall measures exactly this estimator.
  //    Threshold 4/60 ≈ the r14 acceptance angle (3/48), so the verdict
  //    set is comparable while precision improves with the extra bits. ──
  private val ShBits = 60
  private val ShThresh = 4
  private val ShBlockOffsets = Seq(0, 15, 30, 45)
  private val ShBlockWidths = Seq(15, 15, 15, 15)

  /** word 3-gram shingles of the space-split token list `l`; the
    * short-document (<3 tokens) branch is the caller's choice so the batch
    * and TOTAL variants can never diverge on the shingling itself. */
  private def shingleCase(shortDocExpr: String): String =
    s"array_distinct(CASE WHEN size(l) >= 3 THEN transform(sequence(1, size(l)-2), i -> concat_ws(' ', slice(l, i, 3))) ELSE $shortDocExpr END)"
  private val shinglesSpark = shingleCase("cast(array() as array<string>)")
  private val shinglesSql =
    "list_distinct(list_transform(range(1, greatest(len(l)-2,0)+1), i -> l[i]||' '||l[i+1]||' '||l[i+2]))"

  // ── reusable MinHash near-dup index API (dd_minhash_lsh,
  //    dd_incremental_lsh, NearDupIndexSpec's persisted-index flow) ──

  /** MinHash signature table (doc_id, mh0..mh15) for a `(doc_id, text)`
    * document set — ONE wide aggregation, map-side combined. This is the
    * table a production corpus persists as its near-dup index. Documents
    * with fewer than 3 tokens yield no shingles and hence NO signature row
    * (matching the DuckDB oracle); streaming callers that must cover every
    * document use [[minhashSignaturesTotal]]. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    signaturesFrom(docs, shinglesSpark)

  /** TOTAL signature variant for the streaming admit gate: a document too
    * short to shingle (<3 tokens) hashes its whole text as a single
    * shingle, so EVERY document gets a signature row — short docs are never
    * silently lost, identical short docs still collide on every band (the
    * replay / exact-dup guard), and distinct short docs admit. */
  def minhashSignaturesTotal(docs: DataFrame): DataFrame =
    signaturesFrom(docs, shingleCase("array(coalesce(text, ''))"))

  private def signaturesFrom(docs: DataFrame, shingleExpr: String): DataFrame =
    docs
      .withColumn("l", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .select(col("doc_id"), (sid60(col("shingle")) % MhP).as("sidp"))
      .groupBy(col("doc_id")).agg(
        min((col("sidp") * (31 * 0 + 7) + (17 * 0 + 3)) % MhP).as("mh0"),
        (1 until MhK).map(k =>
          min((col("sidp") * (31 * k + 7) + (17 * k + 3)) % MhP).as(s"mh$k")): _*)

  /** shared oracle CTE chain `sh/ids/sig/bands/cand`: full-corpus shingle
    * sets, MinHash signatures, band keys, and the DISTINCT LSH candidate
    * pair set — one definition for dd_minhash_lsh and the dd_lsh_recall
    * eval, so the candidate semantics can never drift between them. */
  private lazy val MhCandSql = {
    val mhAgg = (0 until MhK)
      .map(k => s"min((sidp*${31 * k + 7}+${17 * k + 3})%$MhP) AS mh$k")
      .mkString(",\n    ")
    val bandRows = (0 until MhBands).map { b =>
      val key = (0 until 4).map(i => s"mh${4 * b + i}").mkString("||','||")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest($shinglesSql) AS shingle
       |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))),
       |ids AS (SELECT doc_id, ${sid60Sql("shingle")} % $MhP AS sidp FROM sh),
       |sig AS (SELECT doc_id,
       |    $mhAgg
       |  FROM ids GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** shared oracle CTE chain `tw/th/sb/sh2/blocks/scand/shv`: weighted
    * token hashes → 60-bit simhash signatures → pigeonhole block keys →
    * candidate pairs → hamming-thresholded VERDICT pairs. One definition
    * for dd_simhash and the dd_simhash_recall eval. */
  private lazy val ShVerdictSql: String = {
    val sums = (0 until ShBits)
      .map(j => s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN w ELSE -w END) AS s$j")
      .mkString(",\n    ")
    val sig = (0 until ShBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString("+")
    val blockRows = ShBlockOffsets.zip(ShBlockWidths).zipWithIndex.map {
      case ((off, w), j) =>
        s"SELECT doc_id, $j AS blk, (simhash // ${1L << off}) % ${1L << w} AS bv FROM sh2"
    }.mkString("\n  UNION ALL ")
    s"""tw AS (
       |  SELECT doc_id, token, count(*) AS w FROM (
       |    SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)
       |  GROUP BY doc_id, token),
       |th AS (SELECT doc_id, w, ${sid60Sql("token")} AS h FROM tw),
       |sb AS (SELECT doc_id,
       |    $sums
       |  FROM th GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, $sig AS simhash FROM sb),
       |blocks AS (
       |  $blockRows),
       |scand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM blocks a JOIN blocks b
       |            ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |shv AS (
       |  SELECT c.doc_a, c.doc_b, bit_count(xor(sa.simhash, sbb.simhash)) AS hamming
       |  FROM scand c JOIN sh2 sa ON sa.doc_id = c.doc_a JOIN sh2 sbb ON sbb.doc_id = c.doc_b
       |  WHERE bit_count(xor(sa.simhash, sbb.simhash)) <= $ShThresh)""".stripMargin
  }

  /** the simhash SIGN TABLE `(doc_id, simhash)` — the per-snapshot
    * artifact of the simhash dedup pipeline (the streaming gate persists
    * exactly this index), memoized per (session, dataset) as an eager
    * localCheckpoint like the minhash signature tables: the 60-sum
    * aggregation over the full token scan is the one-time index-build
    * step, and blocks + both verify sides of every consumer read the
    * artifact rather than re-signing the corpus. (Round 12: the round-11
    * per-execution pin was silently amortized across bench passes by the
    * since-fixed CacheManager leak — memoizing makes the artifact
    * treatment explicit and ColdBuilds-timed instead of accidental.) */
  private val shSigCache = new graft.core.SessionCache[DataFrame]()
  private def simhashSignatures(s: SparkSession, d: String): DataFrame =
    shSigCache.get(s, d) {
      val tw = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("w"))
      val th = tw.select(col("doc_id"), col("w"), sid60(col("token")).as("h"))
      // one wide aggregation: 60 signed bit-sums per doc
      val bitSums = (0 until ShBits).map(j =>
        sum(when(expr(s"(h div ${1L << j}) % 2") === 1, col("w")).otherwise(-col("w")))
          .as(s"s$j"))
      val sb = th.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val sigCol = (0 until ShBits)
        .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      sb.select(col("doc_id"), sigCol.as("simhash"))
        .localCheckpoint(eager = true)
    }

  /** cold-build hook: force the memoized simhash sign table. */
  private[graft] def buildSimhashSignatures(s: SparkSession, d: String): Unit = {
    simhashSignatures(s, d); ()
  }

  /** the dd_simhash program without its final sort: the memoized sign
    * table, pigeonhole block-collision candidates, exact hamming verify at
    * the threshold — shared by dd_simhash and the dd_simhash_recall eval. */
  private def simhashVerdicts(s: SparkSession, d: String): DataFrame = {
    val sh2 = simhashSignatures(s, d)
    val blockVals = ShBlockOffsets.zip(ShBlockWidths).map { case (off, w) =>
      expr(s"(simhash div ${1L << off}) % ${1L << w}")
    }
    val blocks = sh2.select(col("doc_id"),
      posexplode(array(blockVals: _*)).as(Seq("blk", "bv")))
    val cand = blocks.as("a").join(blocks.as("b"), Seq("blk", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sh2.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val sbb = sh2.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    cand.join(sa, Seq("doc_a")).join(sbb, Seq("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast(LongType))
      .filter(col("hamming") <= ShThresh)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** target size of the deterministic truth SAMPLE both recall evals run
    * on (round 14): the truth side is an exact shingle self-join whose
    * cost tracks Σdf² — quadratic in dup structure, which made the
    * uncapped form the ONLY two rows excluded from the replica sweeps.
    * Sampling to a fixed SIZE (not rate) bounds the truth join at any
    * corpus scale: admission is the tx_mix_apply trick — a doc enters iff
    * its 60-bit md5 hash mod 1e6 falls under rpm = min(1e6,
    * target·1e6 div N), with N from one bounded count job. Unbiased
    * (md5-uniform), reproducible across engines and reruns (no RNG
    * state), and DEGENERATE below the target: corpora ≤ 2048 docs sample
    * everything, so the fixture-scale eval results are byte-identical to
    * the former uncapped rows while 8×/64× replica sweeps now cover the
    * whole registry with no exception list. */
  private val TruthSampleTarget = 2048L

  /** shared oracle CTE chain `tsn/tsdocs/tsh/tcnt/tcm/truth`: the exact
    * word-3-gram Jaccard >= 1/2 pair set (integer-exact 3·common >=
    * |A|+|B|) over the [[TruthSampleTarget]]-bounded deterministic doc
    * sample — the one truth both dedup-estimator recall evals join
    * against (recall is measured on pairs whose BOTH endpoints are
    * sampled; the estimators under audit keep their full-corpus scope). */
  private lazy val JaccTruthSql: String =
    s"""tsn AS (SELECT least(1000000, ($TruthSampleTarget*1000000)//count(*)) AS rpm
       |        FROM documents),
       |tsdocs AS (
       |  SELECT doc_id, text FROM documents, tsn
       |  WHERE ${sid60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < tsn.rpm),
       |tsh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest($shinglesSql) AS shingle
       |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM tsdocs))),
       |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY doc_id),
       |tcm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |        FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |truth AS (
       |  SELECT tcm.doc_a, tcm.doc_b, CAST(common AS BIGINT) AS common,
       |    CAST(ca.n + cb.n - common AS BIGINT) AS uni
       |  FROM tcm JOIN tcnt ca ON ca.doc_id = tcm.doc_a
       |  JOIN tcnt cb ON cb.doc_id = tcm.doc_b
       |  WHERE 3*common >= ca.n + cb.n)""".stripMargin

  /** the Spark side of [[JaccTruthSql]] — (doc_a, doc_b, common, uni) over
    * the same shingle definition and the same deterministic
    * [[TruthSampleTarget]]-bounded doc sample (one memoized bounded count
    * job derives the identical integer rpm on both engines). */
  private def jaccTruth(s: SparkSession, d: String): DataFrame = {
    val rpm = math.min(1000000L, TruthSampleTarget * 1000000L / docCount(s, d))
    val sh = T.documents(s, d)
      .filter(sid60(col("doc_id").cast(StringType)) % 1000000L < rpm)
      .withColumn("l", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shinglesSpark)).as("shingle"))
    // one shingle-keyed shuffle; both truth grains (per-doc sizes and
    // per-pair intersections) read the grouped relation — checkpointed,
    // not persisted, so the pin dies with the query (cache-hygiene rule)
    val grouped = sh.groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .localCheckpoint(eager = true)
    val cnt = grouped.select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cm = grouped
      .select(explode(expr(
        "flatten(transform(docs, x -> filter(transform(docs, y -> struct(x AS a, y AS b)), p -> p.a < p.b)))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
    cm
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("common") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        (col("na") + col("nb") - col("common")).as("uni"))
  }

  /** LSH band table (doc_id, band, band_key) of a signature table — the
    * other half of the persisted index; row-local, no shuffle. */
  def bandTable(sig: DataFrame): DataFrame = {
    val bandKeys = (0 until MhBands).map(b =>
      concat_ws(",", (0 until 4).map(i => col(s"mh${4 * b + i}")): _*))
    sig.select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
  }

  /** probe a persisted near-dup index with a new batch's signatures →
    * one admit/drop verdict row per new document
    * (doc_id, n_cand, best_jac, is_neardup). The batch-derived sides
    * (band keys, candidates, batch signatures) BROADCAST; the corpus
    * tables stream through without a shuffle — in production they are
    * parquet reads of the persisted index (NearDupIndexSpec drives that
    * flow end to end). */
  def probeNearDupIndex(newSig: DataFrame, corpusSig: DataFrame,
      corpusBands: DataFrame): DataFrame = {
    val cand = corpusBands
      .join(broadcast(bandTable(newSig).withColumnRenamed("doc_id", "new_id")),
        Seq("band", "band_key"))
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .distinct()
    val nMatch = (0 until MhK)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    val sa = newSig.select(col("doc_id").as("new_id") +:
      (0 until MhK).map(k => col(s"mh$k").as(s"a$k")): _*)
    val sb = corpusSig.select(col("doc_id").as("corpus_id") +:
      (0 until MhK).map(k => col(s"mh$k").as(s"b$k")): _*)
    val ver = sb.join(broadcast(cand), Seq("corpus_id"))
      .join(broadcast(sa), Seq("new_id"))
      .select(col("new_id"), (nMatch / lit(16.0)).as("jac"))
    val per = ver.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_cand"), max(col("jac")).as("best_jac"))
    newSig.select(col("doc_id"))
      .join(broadcast(per.withColumnRenamed("new_id", "doc_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("best_jac"), lit(0.0)).as("best_jac"),
        (coalesce(col("best_jac"), lit(0.0)) >= 0.5).as("is_neardup"))
  }

  /** Signature-carrying band index (bkey, doc_id, mh0..mh15) — the layout a
    * 100 TB corpus PERSISTS for the large-batch probe path: one single-column
    * join key (`bkey` embeds the band ordinal, so bucketing/joining needs no
    * composite key) and the full signature in-row, so a probe verifies
    * candidates WITHOUT a second join against the signature table. Row-local
    * (4 rows/doc), no shuffle to build. Persist with [[writeBandIndex]] to
    * make the corpus side of the probe exchange-free. */
  def bandIndex(sig: DataFrame): DataFrame = {
    val bandKeys = (0 until MhBands).map(b =>
      concat_ws(",", lit(b) +: (0 until 4).map(i => col(s"mh${4 * b + i}")): _*))
    sig.select(col("doc_id") +: (0 until MhK).map(k => col(s"mh$k")) :+
      explode(array(bandKeys: _*)).as("bkey"): _*)
  }

  /** Persist a corpus band index BUCKETED by `bkey` (external table at
    * `path`): a later probe's shuffle join on `bkey` then reads the corpus
    * side straight out of its buckets — zero corpus exchange, only the new
    * batch shuffles (NearDupIndexSpec gates the plan). This is the index
    * layout the daily 100 TB refresh maintains. */
  def writeBandIndex(sig: DataFrame, table: String, path: String,
      nBuckets: Int = 32): Unit =
    bandIndex(sig).write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, "bkey")
      .saveAsTable(table)

  /** Large-batch probe: same verdicts as [[probeNearDupIndex]], but the
    * batch side is NEVER broadcast — the day the daily batch outgrows
    * Spark's broadcast ceiling (~8 GB against a 100 TB corpus) this is the
    * path that still runs. The batch's band index shuffle-joins the
    * corpus's persisted [[bandIndex]] on `bkey` (corpus exchanged at most
    * once — not at all when the index is bucketed via [[writeBandIndex]]);
    * signatures ride in-row on both sides, so candidate verification is
    * in-line arithmetic, no corpusSig join. Everything after the band join
    * is candidate-sized (pair dedup, per-doc verdict agg) and shuffles on
    * batch-derived keys only. Reference analog as for the broadcast path:
    * the insert-if-absent guards (mocsettlement.py:29-52) generalized to
    * near-dup signatures. */
  def probeNearDupIndexShuffle(newSig: DataFrame, corpusIndex: DataFrame): DataFrame = {
    // select by NAME before the positional rename: a caller's reordered
    // (schema-equivalent) index must not silently relabel hash columns
    val idxCols = col("doc_id") +: (0 until MhK).map(k => col(s"mh$k")) :+ col("bkey")
    val nb = bandIndex(newSig).select(idxCols: _*)
      .toDF("new_id" +: (0 until MhK).map(k => s"a$k") :+ "bkey": _*)
    val cb = corpusIndex.select(idxCols: _*)
      .toDF("corpus_id" +: (0 until MhK).map(k => s"b$k") :+ "bkey": _*)
    val nMatch = (0 until MhK)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    // hint("shuffle_hash") pins the join away from broadcast no matter what
    // AQE estimates — the whole point of this path is batch > broadcastable
    val pair = cb.join(nb.hint("shuffle_hash"), Seq("bkey"))
      .select(col("new_id"), col("corpus_id"), (nMatch / lit(16.0)).as("jac"))
      // a pair matching in several bands appears once per band; jac is
      // functionally dependent on the pair, so first() dedups exactly
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(first(col("jac")).as("jac"))
    val per = pair.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_cand"), max(col("jac")).as("best_jac"))
      .withColumnRenamed("new_id", "doc_id")
    newSig.select(col("doc_id"))
      .join(per.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("best_jac"), lit(0.0)).as("best_jac"),
        (coalesce(col("best_jac"), lit(0.0)) >= 0.5).as("is_neardup"))
  }

  /** Intra-batch near-dups: doc_ids that are a near-dup (est. jaccard >=
    * 0.5) of a LOWER-id document in the SAME signature set. Dropping these
    * approximates sequential first-wins admission: on a chain a~b~c where
    * a is kept, both b and c drop when each pairs with a lower id — a
    * superset of strict sequential greedy (which would re-admit c if its
    * only lower near-dup b was itself dropped). Band self-join bounded the
    * same way as dd_minhash_lsh; batch-sized all around. */
  def intraBatchNearDups(sig: DataFrame): DataFrame = {
    val bands = bandTable(sig)
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sigCols = col("doc_id") +: (0 until MhK).map(k => col(s"mh$k"))
    val sa = sig.select(sigCols: _*).toDF("doc_a" +: (0 until MhK).map(k => s"a$k"): _*)
    val sb = sig.select(sigCols: _*).toDF("doc_b" +: (0 until MhK).map(k => s"b$k"): _*)
    val nMatch = (0 until MhK)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .filter((nMatch / lit(16.0)) >= 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
  }

  /** shared corpus/batch doc_id split (top-10% slice = the "new batch") for
    * the two incremental-LSH paths. Memoized per (session, dataset) as
    * eager localCheckpoints: the corpus signature table is the persisted
    * MinHash INDEX of the incremental story (production refreshes read it
    * from storage, they don't re-sign the corpus per probe mode), and the
    * checkpoint both survives the bench's cache clears and stops each
    * caller re-persisting its own copy. */
  private val incCache = new graft.core.SessionCache[(DataFrame, DataFrame)]()
  private[graft] def incrementalSplit(s: SparkSession, d: String): (DataFrame, DataFrame) =
    incCache.get(s, d) {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val cutDf = docs.agg(expr("(max(doc_id)*9) div 10").as("cutv"))
      val flagged = docs.crossJoin(broadcast(cutDf))
      (minhashSignatures(flagged.filter(col("doc_id") < col("cutv")))
          .localCheckpoint(eager = true),
        minhashSignatures(flagged.filter(col("doc_id") >= col("cutv")))
          .localCheckpoint(eager = true))
    }

  /** one oracle for both incremental-LSH paths (broadcast probe and
    * large-batch shuffle probe) — identical verdicts required of both. */
  private lazy val IncrementalLshSql: String = {
    val mhAgg = (0 until MhK)
      .map(k => s"min((sidp*${31 * k + 7}+${17 * k + 3})%$MhP) AS mh$k")
      .mkString(",\n        |    ")
    def bandRows(src: String) = (0 until MhBands).map { b =>
      val key = (0 until 4).map(i => s"mh${4 * b + i}").mkString("||','||")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM $src"
    }.mkString("\n        |  UNION ALL ")
    val matches = (0 until MhK)
      .map(k => s"(CASE WHEN sa.mh$k=sb.mh$k THEN 1 ELSE 0 END)").mkString("+")
    s"""WITH cutoff AS (SELECT (max(doc_id)*9)//10 AS cut FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest($shinglesSql) AS shingle
       |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))),
       |ids AS (SELECT doc_id, ${sid60Sql("shingle")} % $MhP AS sidp FROM sh),
       |sig AS (SELECT doc_id,
       |    $mhAgg
       |  FROM ids GROUP BY doc_id),
       |csig AS (SELECT s.* FROM sig s, cutoff c WHERE s.doc_id < c.cut),
       |nsig AS (SELECT s.* FROM sig s, cutoff c WHERE s.doc_id >= c.cut),
       |cbands AS (
       |  ${bandRows("csig")}),
       |nbands AS (
       |  ${bandRows("nsig")}),
       |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
       |         FROM nbands n JOIN cbands c
       |           ON n.band = c.band AND n.band_key = c.band_key),
       |ver AS (SELECT cd.new_id, cd.corpus_id, ($matches)/16.0 AS jac
       |        FROM cand cd JOIN sig sa ON sa.doc_id = cd.new_id
       |        JOIN sig sb ON sb.doc_id = cd.corpus_id),
       |per AS (SELECT new_id, count(*) AS n_cand, max(jac) AS best_jac
       |        FROM ver GROUP BY new_id)
       |SELECT n.doc_id, coalesce(p.n_cand, 0) AS n_cand,
       |  coalesce(p.best_jac, 0.0) AS best_jac,
       |  coalesce(p.best_jac, 0.0) >= 0.5 AS is_neardup
       |FROM nsig n LEFT JOIN per p ON p.new_id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin
  }

  /** shared winnow-pair machinery (dd_winnow candidates; dd_cluster edges):
    * fingerprint sets per doc, df-capped fingerprint groups, in-row pair
    * expansion, pairs sharing >= 2 fingerprints. */
  private val WinnowPairsCte: String = {
    val w = 16
    val consts = (0 until w).map(j =>
      BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
    val terms = consts.zipWithIndex.map { case (c, j) =>
      s"CAST(ascii(substr(text, CAST(i + $j AS INTEGER), 1)) AS BIGINT) * $c"
    }.mkString(" + ")
    s"""hs AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) < $w THEN NULL ELSE
       |      list_transform(range(1, length(text) - ${w - 2}),
       |        i -> ($terms) % ${RollingHash.M})
       |    END AS hashes
       |  FROM documents),
       |wn AS (
       |  SELECT doc_id,
       |    CASE WHEN hashes IS NULL THEN NULL
       |      WHEN len(hashes) <= 32 THEN [list_min(hashes)]
       |      ELSE list_sort(list_distinct(list_transform(range(1, len(hashes) - 30),
       |        j -> list_min(hashes[CAST(j AS INTEGER):CAST(j + 31 AS INTEGER)]))))
       |    END AS fps
       |  FROM hs),
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM wn WHERE fps IS NOT NULL),
       |grouped AS (SELECT fp, list_sort(list(doc_id)) AS docs FROM f
       |            GROUP BY fp HAVING count(*) <= 20),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM (SELECT fp, unnest(docs) AS doc_id FROM grouped) a
       |  JOIN (SELECT fp, unnest(docs) AS doc_id FROM grouped) b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** exploded (doc_id, fp) winnow fingerprint table — shared by the pair
    * queries (dd_winnow/dd_cluster) and the containment query. */
  private def winnowFps(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        toCol(WinnowExpr(toExpr(col("text")), 16, 32)).as("fps"))
      .filter(col("fps").isNotNull)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  /** df-capped fingerprint groups (fp, docs) — fingerprints shared by more
    * than 20 documents are dropped as non-discriminative boilerplate, the
    * cap that bounds every pair expansion. */
  private def fpGroups(s: SparkSession, d: String): DataFrame =
    winnowFps(s, d).groupBy(col("fp"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= 20)

  /** pair expansion of [[fpGroups]]: pairs sharing >= 2 capped
    * fingerprints. */
  private def pairsFromGroups(grouped: DataFrame): DataFrame =
    grouped
      .select(explode(expr(
        "flatten(transform(docs, x -> filter(transform(docs, y -> struct(x AS a, y AS b)), p -> p.a < p.b)))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)

  /** pairs sharing >= 2 winnow fingerprints (no ordering — callers add).
    *
    * Memoized per (session, dataset) as an eager localCheckpoint: the pair
    * graph is the shared upstream artifact of SIX registered queries
    * (dd_winnow, dd_cluster, tx_curation, tx_survivorship,
    * tx_train_val_split, tx_pipeline_funnel) — in production the
    * fingerprint→pair pass runs once per corpus snapshot and every
    * downstream curation step reads its output, so each query paying the
    * sign+group+expand pipeline again measured the wrong thing. The
    * checkpoint (not .persist) survives the bench's per-run cache clears,
    * and the fpGroups cache is released once the pairs are materialized. */
  private final case class WinnowArt(pairs: DataFrame, fpCounts: DataFrame)
  private val wpCache = new graft.core.SessionCache[WinnowArt]()
  private def winnowArtifacts(s: SparkSession, d: String): WinnowArt =
    wpCache.get(s, d) {
      val grouped = fpGroups(s, d).persist()
      val pairs = pairsFromGroups(grouped).localCheckpoint(eager = true)
      // per-doc CAPPED fingerprint counts — dd_containment's denominator,
      // one row per doc, same df-capped universe the pairs count shared
      // hits in. Checkpointed alongside the pairs: round 8 memoized only
      // the pair graph, so dd_containment alone kept rebuilding the whole
      // fingerprint pipeline per run (1.0 s → 1.9-2.5 s measured across
      // rounds, the one flagged regression) while its siblings read the
      // artifact — both consumers of `grouped` now materialize in ONE
      // build and the query reads two checkpoints.
      val fpCounts = grouped.select(explode(col("docs")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
        .localCheckpoint(eager = true)
      grouped.unpersist(blocking = false)
      WinnowArt(pairs, fpCounts)
    }
  private def winnowPairs(s: SparkSession, d: String): DataFrame =
    winnowArtifacts(s, d).pairs

  /** cold-build hook: force the memoized winnow-pair artifact so the
    * bench's artifact pass can time the pair build in isolation. */
  private[graft] def buildWinnowPairs(s: SparkSession, d: String): Unit = {
    winnowPairs(s, d); ()
  }

  /** snapshot cut for the INCREMENTAL label maintenance below: documents
    * with `doc_id >= cut` (the top ~10% of the id range) stand in for "the
    * newly admitted batch" and everything below is "the prior corpus
    * snapshot" — the same 90/10 framing as ss_centroid_drift. Memoized:
    * one scalar agg per (session, dataset); the collect is a single Long
    * (N-independent, like the other bounded scalar heads). */
  private val cutCache = new graft.core.SessionCache[java.lang.Long]()
  private[graft] def snapshotCut(s: SparkSession, d: String): Long =
    cutCache.get(s, d) {
      Long.box(T.documents(s, d)
        .agg(expr("(max(doc_id)*9) div 10").as("cutv"))
        .collect()(0).getLong(0))
    }

  /** corpus document count, memoized per (session, dataset) — one bounded
    * count job backing the recall evals' deterministic truth-sample rate
    * (the same per-snapshot-scalar pattern as [[snapshotCut]] and
    * VectorOps' corpus count). */
  private val docCountCache = new graft.core.SessionCache[java.lang.Long]()
  private def docCount(s: SparkSession, d: String): Long =
    docCountCache.get(s, d) { Long.box(T.documents(s, d).count()) }

  /** BASE near-dup cluster labels — connected components over the pairs of
    * the PRIOR corpus snapshot only (both endpoints below [[snapshotCut]]).
    * This is the weekly-compaction artifact: at 100 TB the full CC rebuild
    * runs on this cadence, not per batch — every per-batch snapshot is
    * maintained by [[mergeLabels]] on top of it. */
  private val ccBaseCache = new graft.core.SessionCache[DataFrame]()
  private def clusterLabelsBase(s: SparkSession, d: String): DataFrame =
    ccBaseCache.get(s, d) {
      val cut = snapshotCut(s, d)
      connectedComponents(
        winnowPairs(s, d)
          .filter(col("doc_a") < cut && col("doc_b") < cut)
          .select(col("doc_a"), col("doc_b")))
        .localCheckpoint(eager = true)
    }

  /** near-dup cluster labels over [[winnowPairs]] — THE per-snapshot dedup
    * artifact (four queries consume it), maintained INCREMENTALLY since
    * round 13: connected components run once over the prior snapshot's
    * pairs ([[clusterLabelsBase]], the weekly-compaction role), and the
    * newly admitted batch's pairs — every pair touching a `doc_id >=`
    * [[snapshotCut]], i.e. exactly what the streaming probe emits per
    * batch — fold in via [[mergeLabels]], whose CC runs on the CONDENSED
    * graph (old components collapse to one node), never the corpus.
    * Incremental ≡ full rebuild EXACTLY: CC(P ∪ Q) = merge(CC(P), Q) for
    * any edge partition (ClusterSpec pins this on random graphs;
    * CurationBatchSpec pins artifact equality on the fixture corpus; every
    * consumer's DuckDB oracle replays the FULL graph, so all of them
    * re-prove it per round). Eager localCheckpoint, once per (session,
    * dataset). */
  private val ccCache = new graft.core.SessionCache[DataFrame]()
  private def clusterLabels(s: SparkSession, d: String): DataFrame =
    ccCache.get(s, d) {
      val cut = snapshotCut(s, d)
      mergeLabels(
        clusterLabelsBase(s, d),
        winnowPairs(s, d)
          .filter(col("doc_a") >= cut || col("doc_b") >= cut)
          .select(col("doc_a"), col("doc_b")))
        .localCheckpoint(eager = true)
    }

  /** the FULL-rebuild form of [[clusterLabels]] — the weekly-compaction
    * path that resorbs any long-horizon drift; exposed for the equality
    * spec, not registered as an artifact (the incremental form IS the
    * artifact). */
  private[graft] def fullRebuildClusterLabels(s: SparkSession, d: String): DataFrame =
    connectedComponents(winnowPairs(s, d).select(col("doc_a"), col("doc_b")))

  /** cold-build hooks: base CC (the amortized weekly-compaction cost) and
    * the incremental merge (the TRUE per-batch cost — the number that
    * matters at 100 TB) time as separate bench cold rows. */
  private[graft] def buildClusterLabelsBase(s: SparkSession, d: String): Unit = {
    clusterLabelsBase(s, d); ()
  }
  private[graft] def buildClusterLabels(s: SparkSession, d: String): Unit = {
    clusterLabels(s, d); ()
  }
  private[graft] def incrementalClusterLabels(s: SparkSession, d: String): DataFrame =
    clusterLabels(s, d)

  /** the fused text ∪ embedding pair graph behind the ensemble verdict. */
  private def ensemblePairs(s: SparkSession, d: String): DataFrame = {
    val tpair = winnowPairs(s, d).select(col("doc_a"), col("doc_b"))
    val epair = VectorOps.semanticPairs(s, d)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    tpair.unionByName(epair).dropDuplicates(Seq("doc_a", "doc_b"))
  }

  /** BASE ensemble labels — CC over the prior snapshot's fused pair graph
    * (see [[clusterLabelsBase]]). */
  private val ensBaseCache = new graft.core.SessionCache[DataFrame]()
  private def ensembleLabelsBase(s: SparkSession, d: String): DataFrame =
    ensBaseCache.get(s, d) {
      val cut = snapshotCut(s, d)
      connectedComponents(
        ensemblePairs(s, d)
          .filter(col("doc_a") < cut && col("doc_b") < cut))
        .localCheckpoint(eager = true)
    }

  /** ENSEMBLE cluster labels — connected components over the UNION of the
    * winnow text-pair graph and the SemDeDup embedding pair graph
    * (VectorOps.semanticPairs), incrementally maintained exactly like
    * [[clusterLabels]]: base CC over the prior snapshot's fused graph +
    * [[mergeLabels]] of the admitted batch's fused pairs. */
  private val ensCache = new graft.core.SessionCache[DataFrame]()
  private def ensembleLabels(s: SparkSession, d: String): DataFrame =
    ensCache.get(s, d) {
      val cut = snapshotCut(s, d)
      mergeLabels(
        ensembleLabelsBase(s, d),
        ensemblePairs(s, d)
          .filter(col("doc_a") >= cut || col("doc_b") >= cut))
        .localCheckpoint(eager = true)
    }

  /** full-rebuild form of [[ensembleLabels]] for the equality spec. */
  private[graft] def fullRebuildEnsembleLabels(s: SparkSession, d: String): DataFrame =
    connectedComponents(ensemblePairs(s, d))

  /** cold-build hooks for the ensemble label artifact (base + merge). */
  private[graft] def buildEnsembleLabelsBase(s: SparkSession, d: String): Unit = {
    ensembleLabelsBase(s, d); ()
  }
  private[graft] def buildEnsembleLabels(s: SparkSession, d: String): Unit = {
    ensembleLabels(s, d); ()
  }
  private[graft] def incrementalEnsembleLabels(s: SparkSession, d: String): DataFrame =
    ensembleLabels(s, d)

  /** BM25 scored POSTINGS `(doc_id, token, term_score)` — the retrieval
    * tier's per-snapshot index artifact: every (doc, term) pair's full
    * integer BM25 contribution (k1 = 1.2, b = 0.75; see tx_bm25 for the
    * exact-rational clearing), precomputed once so a query is just a
    * broadcast term join + per-doc sum + top-k. Memoized per (session,
    * dataset) as an eager localCheckpoint like every other index build
    * (quantized corpus, winnow pairs); ColdBuilds times it as
    * `text_bm25_postings`. At 100 TB this IS the inverted index a search
    * tier persists — the tf/df/dl stats passes run once per snapshot. */
  private val bm25Cache = new graft.core.SessionCache[DataFrame]()
  private[graft] def bm25Postings(s: SparkSession, d: String): DataFrame =
    bm25Cache.get(s, d) {
      val toks = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val st = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(toks.agg(count(lit(1)).as("total_toks")))
      tf.join(dfr, Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(st))
        .select(col("doc_id"), col("token"),
          expr("(((n_docs*1000000) div df) * 22000 * tf) div " +
            "(10000*tf + 3000 + (9000*dl*n_docs) div total_toks)").as("term_score"))
        .localCheckpoint(eager = true)
    }

  /** cold-build hook for the BM25 postings artifact. */
  private[graft] def buildBm25Postings(s: SparkSession, d: String): Unit = {
    bm25Postings(s, d); ()
  }

  /** parameterized BM25 top-k over [[bm25Postings]] — the program behind
    * the serving tier's /search route: broadcast the (tiny) term set, sum
    * per-doc contributions in one keyed agg, global BoundedTopK — the
    * collect downstream is bounded at k rows by construction. Unknown
    * terms simply contribute nothing; an all-unknown query returns an
    * empty frame (total, like topkFor). */
  def bm25For(s: SparkSession, d: String, terms: Seq[String], k: Int): DataFrame = {
    import s.implicits._
    val topk = udaf(graft.functions.BoundedTopK[Long](k))
    bm25Postings(s, d)
      .join(broadcast(terms.distinct.toDF("token")), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
      .agg(topk(-col("score"), col("doc_id")).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t._2").as("doc_id"), (-col("t._1")).as("score"),
        (col("r0") + 1).cast(LongType).as("rnk"))
  }

  /** Connected components over an undirected pair graph `(doc_a, doc_b)`:
    * returns one `(doc_id, label)` row per node, label = min node id of
    * the component.
    *
    * Min-label propagation with POINTER JUMPING: each round first takes
    * the min over self ∪ neighbor labels, then shortcuts
    * `label := label(label)` (every label is itself a node id, so the
    * lookup always hits). The shortcut halves the remaining distance to
    * the component min every round, so the loop converges in
    * O(log diameter) rounds — `maxRounds = 40` covers any diameter up to
    * ~2^40. Labels only ever decrease, so an unchanged label SUM between
    * rounds proves the fixpoint (one scalar aggregate per round; no data
    * collects to the driver). If the cap is ever hit the call FAILS
    * rather than returning silently wrong labels.
    *
    * The loop itself runs on co-partitioned pair RDDs, not DataFrames —
    * the one shape where that is the right call (same reason GraphX is
    * RDD-based): a fixed `HashPartitioner` shared by the edge set and the
    * label table makes the per-round edge⋈label join NARROW (zero
    * shuffle), leaves only the label-sized reduceByKey/re-key shuffles,
    * and skips Catalyst re-planning per round. Parallelism is
    * size-adaptive — one partition per ~1M directed edges up to the
    * cluster's default parallelism — so a small candidate graph doesn't
    * pay hundreds of empty-task launches per round and a 100 TB pair
    * graph still fans out fully.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    // persist the directed pairs BEFORE mirroring: the pair graph is
    // usually the output of an expensive candidate join, and the edge
    // mirror below would otherwise compute it twice
    val directed = pairs
      .select(col("doc_a").cast(LongType), col("doc_b").cast(LongType))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist()
    val m = directed.count()
    val nPart = math.max(1L, math.min(sc.defaultParallelism.toLong,
      2 * m / 1000000L + 1)).toInt
    val part = new org.apache.spark.HashPartitioner(nPart)
    val edges = directed
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part).persist()
    var labels = edges.keys.distinct(nPart).map(v => (v, v))
      .partitionBy(part).persist()
    val spent = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    spent += labels
    var prevSum = Long.MinValue
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // (u,v) ⋈ (u, lu) is narrow (shared partitioner); u's label becomes
      // a candidate for v, min'd with the previous labels in one shuffle
      val prop = edges.join(labels)
        .map { case (_, (v, lu)) => (v, lu) }
        .union(labels)
        .reduceByKey(part, math.min(_: Long, _: Long))
      // pointer jump: re-key by label (one label-sized shuffle) and look
      // the label's own label up in place
      val next = prop.map { case (n, l) => (l, n) }
        .join(prop)
        .map { case (_, (n, ll)) => (n, ll) }
        .persist()
      spent += next
      // materializing action + fixpoint probe in one pass (wrapping Long
      // sum: labels strictly decrease until converged, so equality with
      // the previous round's sum is the fixpoint)
      val s = next.aggregate(0L)((acc, kv) => acc + kv._2, _ + _)
      converged = s == prevSum
      prevSum = s
      labels = next
      round += 1
    }
    directed.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    if (!converged) {
      spent.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "refusing to emit possibly-wrong labels")
    }
    // release every intermediate round; the final labels stay cached until
    // the caller's action completes (recomputable from lineage if evicted)
    spent.dropRight(1).foreach(_.unpersist(blocking = false))
    spark.createDataFrame(labels).toDF("doc_id", "label")
  }

  /** INCREMENTAL union-find maintenance: fold a new batch of pairs into an
    * existing `(doc_id, label)` artifact WITHOUT re-running CC over the
    * full graph.
    *
    * Algebra: CC(P ∪ Q) = merge(CC(P), Q) for ANY partition of the edge
    * set — because every old component is condensed to a single node (its
    * label, which is the component's min member id), connecting condensed
    * nodes connects exactly the underlying components, and the min label
    * of a merged condensed component equals the min member id of the
    * merged full component (old labels ARE min ids; unlabeled endpoints
    * ride in as themselves). So the result is IDENTICAL to a full rebuild
    * over P ∪ Q — ClusterSpec pins this on random graph partitions.
    *
    * Scale contract: the CC here runs on the CONDENSED graph — bounded by
    * |Q| + the number of components Q touches, never the corpus. At 100 TB
    * the per-batch label maintenance is probe-pair-sized; the full-corpus
    * CC rebuild is demoted to a weekly compaction
    * ([[fullRebuildClusterLabels]]).
    *
    * `oldLabels` rows for untouched components pass through unchanged;
    * endpoints of `newPairs` absent from `oldLabels` (genuinely new docs,
    * or old singletons pairing for the first time) enter as their own id
    * and come out labeled. */
  def mergeLabels(oldLabels: DataFrame, newPairs: DataFrame): DataFrame = {
    val pairs = newPairs
      .select(col("doc_a").cast(LongType), col("doc_b").cast(LongType))
      .localCheckpoint(eager = true) // endpoints + 2 lookup legs read it
    // Broadcast hints are CONDITIONAL on the batch actually being
    // batch-sized: in the streaming probe path the pairs are micro-batch
    // bounded and every derived table (endpoints, filtered label lookups,
    // condensed CC) must broadcast so the label artifact streams through
    // unshuffled — but the SNAPSHOT-CUT artifact path feeds every pair
    // touching the top ~10% of ids, a corpus FRACTION that grows linearly
    // with N, and a mandatory hint there would eventually blow the 8 GB
    // broadcast / driver-memory ceiling. One count over the checkpointed
    // pairs (cheap: bounded scan of materialized partitions) decides all
    // five hints at once — every hinted table is O(|pairs|) rows by
    // construction. Past the bound the joins fall back to AQE's choice
    // (shuffle-hash on these key-heavy shapes), which is the correct plan
    // for a corpus-fraction batch anyway.
    val hintAll = pairs.count() <= MergeBroadcastMaxPairs
    def hinted(df: DataFrame): DataFrame = if (hintAll) broadcast(df) else df
    val endA = pairs.select(col("doc_a")).distinct()
    val endB = pairs.select(col("doc_b")).distinct()
    val laT = oldLabels.select(col("doc_id").as("doc_a"), col("label").as("la"))
      .join(hinted(endA), Seq("doc_a"), "left_semi")
      .localCheckpoint(eager = true) // condensed lookup + new-node anti both read it
    val lbT = oldLabels.select(col("doc_id").as("doc_b"), col("label").as("lb"))
      .join(hinted(endB), Seq("doc_b"), "left_semi")
      .localCheckpoint(eager = true)
    // condense: each endpoint maps to its component label (or itself);
    // dedup AFTER condensing — many batch pairs collapse onto few
    // component pairs, and the CC below runs on this bounded graph only
    val condensed = pairs
      .join(hinted(laT), Seq("doc_a"), "left")
      .join(hinted(lbT), Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"),
        coalesce(col("lb"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .dropDuplicates(Seq("doc_a", "doc_b"))
    val cc = connectedComponents(condensed)
      .localCheckpoint(eager = true) // consumed by relabel + new-node legs
    // relabel rows whose (condensed) label merged into a bigger component —
    // cc is condensed-graph-sized, so the artifact streams through one
    // broadcast left join unshuffled (hint conditional like the rest)
    val relabeled = oldLabels
      .join(hinted(cc.select(col("doc_id").as("label"), col("label").as("nl"))),
        Seq("label"), "left")
      .select(col("doc_id"), coalesce(col("nl"), col("label")).as("label"))
    // endpoints of newPairs with no prior label: their condensed node id is
    // their own doc_id, so cc carries their final label directly (laT/lbT
    // hold exactly the batch endpoints that HAD labels — the anti set is
    // computed against those batch-bounded tables, never the artifact)
    val newNodes = endA.select(col("doc_a").as("doc_id"))
      .union(endB.select(col("doc_b").as("doc_id")))
      .distinct()
      .join(hinted(laT.select(col("doc_a").as("doc_id"))
        .union(lbT.select(col("doc_b").as("doc_id"))).distinct()),
        Seq("doc_id"), "left_anti")
      .join(cc, Seq("doc_id"))
    relabeled.unionByName(newNodes)
  }

  /** above this many batch pairs [[mergeLabels]] stops force-broadcasting
    * its batch-derived tables (each is O(|pairs|) rows): ~4 M pair rows of
    * two longs ≈ 64 MB raw — comfortably under the broadcast ceiling with
    * margin for row overhead, and far above any real micro-batch. */
  private val MergeBroadcastMaxPairs = 4L * 1000 * 1000

  /** minimum covered-run length (chars) tx_substring_cut excises — the
    * Lee et al. 2022 50-char production threshold. */
  private val MinCutSpan = 50

  val queries: Seq[Q] = Seq(

    // ── Text analysis ─────────────────────────────────────────────────────

    // Token counting: whitespace tokens, distinct tokens, char lengths.
    // Narrow map over the scan; no shuffle.
    Q(
      "tx_token_count",
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_uniq,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      T.documents(s, d).select(
          col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast(LongType).as("n_uniq"),
          length(col("text")).cast(LongType).as("len_chars"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish tokenization: letter runs / single digits / single punctuation
    // marks (the GPT-2 pre-tokenizer shape), via one codegen'd
    // regexp_extract_all — the token-count path a data pipeline runs before
    // a real BPE pass. Narrow map; no shuffle.
    Q(
      "tx_token_bpe",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS n_bpe,
        |  array_to_string(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')[1:5], '|') AS head5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0))
      T.documents(s, d).select(
          col("doc_id"),
          size(toks).cast(LongType).as("n_bpe"),
          array_join(slice(toks, 1, 5), "|").as("head5"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: stopword ratio, type-token ratio, mean token length,
    // composite score. Identical IEEE double expression tree on both engines
    // → exact compare. One narrow map, codegen'd (higher-order functions).
    Q(
      "tx_quality",
      s"""SELECT doc_id,
         |  len(l) AS n_tokens,
         |  CAST(len(list_filter(l, t -> list_contains($stopListSql, t))) AS DOUBLE)/len(l) AS stop_ratio,
         |  CAST(len(list_distinct(l)) AS DOUBLE)/len(l) AS uniq_ratio,
         |  CAST(length(text)-(len(l)-1) AS DOUBLE)/len(l) AS mean_tok_len,
         |  ${qualityScoreSql("l")} AS quality
         |FROM (SELECT doc_id, text, string_split(text,' ') AS l FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("l")).cast(LongType).as("n_tokens"),
          (expr(s"size(filter(l, t -> array_contains($stopList, t)))").cast(DoubleType)
            / size(col("l"))).as("stop_ratio"),
          (size(array_distinct(col("l"))).cast(DoubleType) / size(col("l"))).as("uniq_ratio"),
          ((length(col("text")) - (size(col("l")) - 1)).cast(DoubleType) / size(col("l")))
            .as("mean_tok_len"),
          qualityScore("l").as("quality"))
        .orderBy(col("doc_id"))
    },

    // Language-ID heuristic: English function-word hit ratio + common-bigram
    // density ('th','he','er','on' char bigrams). Deterministic thresholds;
    // prediction compared against the labeled lang column.
    Q(
      "tx_langid",
      s"""SELECT doc_id, lang,
         |  CASE WHEN stop_ratio >= 0.08 OR bigram_density >= 0.04 THEN 'en' ELSE 'unk' END AS predicted,
         |  (CASE WHEN stop_ratio >= 0.08 OR bigram_density >= 0.04 THEN 'en' ELSE 'unk' END) = lang AS is_match
         |FROM (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(l, t -> list_contains($stopListSql, t))) AS DOUBLE)/len(l) AS stop_ratio,
         |    CAST( (length(text)-length(replace(text,'th','')))/2
         |        + (length(text)-length(replace(text,'he','')))/2
         |        + (length(text)-length(replace(text,'er','')))/2
         |        + (length(text)-length(replace(text,'on','')))/2 AS DOUBLE)/length(text) AS bigram_density
         |  FROM (SELECT doc_id, lang, text, string_split(text,' ') AS l FROM documents))
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      def big(b: String): Column =
        (length(col("text")) - length(regexp_replace(col("text"), b, ""))) / 2
      val scored = T.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(
          col("doc_id"), col("lang"),
          (expr(s"size(filter(l, t -> array_contains($stopList, t)))").cast(DoubleType)
            / size(col("l"))).as("stop_ratio"),
          ((big("th") + big("he") + big("er") + big("on")).cast(DoubleType)
            / length(col("text"))).as("bigram_density"))
      scored
        .withColumn("predicted",
          when(col("stop_ratio") >= 0.08 || col("bigram_density") >= 0.04, "en").otherwise("unk"))
        .select(col("doc_id"), col("lang"), col("predicted"),
          (col("predicted") === col("lang")).as("is_match"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF term ranking with INTEGER-EXACT scoring: idf is scaled to
    // N·10^6 div df (integer division — identical on both engines, no
    // libm ln() cross-engine drift), score = tf × idf. Top-3 terms per
    // doc. Plan: two grouped passes (term stats, doc-term tf) + one join
    // on token + per-doc top-k window — each shuffle keyed, no skew (df
    // is bounded by N).
    Q(
      "tx_tfidf",
      """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)
        |  GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tf)
        |       GROUP BY token),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    tf.tf * ((n.n_docs * 1000000) // df.df) AS score
        |  FROM tf JOIN df USING (token), n)
        |SELECT doc_id, token, score, rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
      val toks = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, Seq("token")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("token"),
          (col("tf") * expr("(n_docs * 1000000) div df")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("score"), col("rnk").cast(LongType).as("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    },

    // CORPUS OVERLAP estimation by K-minimum-values (theta) sketches
    // (round 12) — the set-sketch the family was missing: HLL union-merges
    // (a15_hll_union) but cannot INTERSECT; KMV supports both, which is
    // what "how much of corpus B is already in corpus A" needs before
    // paying a full anti-join at 100 TB. Two shards (even/odd source
    // suffix), elements = 60-bit hashes of the normalized-text
    // fingerprint, k = 64 smallest per shard via BoundedTopK (map-side
    // partial — the sketch IS the shuffle payload, ≤64 values per side at
    // any corpus size). Merge = union the value sets, keep the 64
    // smallest; matches = union-sketch values present in BOTH sides'
    // sketches; jaccard = matches/|union sketch| (exact integer ppm);
    // n̂_union = (k−1)·2^60 / kth-smallest — the one double chain, same
    // correctly-rounded-IEEE discipline as a1b_approx_distinct — with the
    // n < k exact fallback; n̂_∩ = jaccard·n̂_union in integers. The EXACT
    // shard/intersection counts ride beside the estimates so the row
    // shows its own error, like a1b.
    Q(
      "dd_corpus_overlap",
      """WITH el AS (
        |  SELECT TRY_CAST(substr(source, 4) AS BIGINT) % 2 = 0 AS in_a,
        |    CAST('0x'||substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),1,15) AS BIGINT) AS h60
        |  FROM documents),
        |da AS (SELECT DISTINCT h60 FROM el WHERE in_a),
        |db AS (SELECT DISTINCT h60 FROM el WHERE NOT in_a),
        |ka AS (SELECT list(h60 ORDER BY h60) AS va FROM (SELECT h60 FROM da ORDER BY h60 LIMIT 64)),
        |kb AS (SELECT list(h60 ORDER BY h60) AS vb FROM (SELECT h60 FROM db ORDER BY h60 LIMIT 64)),
        |un AS (SELECT va, vb, list_sort(list_distinct(va || vb)) AS uv FROM ka, kb),
        |hu AS (SELECT va, vb, uv[1:CAST(least(64, len(uv)) AS INTEGER)] AS hu FROM un),
        |st AS (
        |  SELECT
        |    CAST(len(hu) AS BIGINT) AS m_union,
        |    CAST(len(list_filter(hu, x -> list_contains(va, x) AND list_contains(vb, x))) AS BIGINT) AS matches,
        |    hu[CAST(len(hu) AS INTEGER)] AS kth
        |  FROM hu),
        |ex AS (
        |  SELECT (SELECT count(*) FROM da) AS n_a, (SELECT count(*) FROM db) AS n_b,
        |    (SELECT count(*) FROM da JOIN db USING (h60)) AS n_inter_exact)
        |SELECT ex.n_a, ex.n_b, ex.n_inter_exact, st.m_union, st.matches,
        |  (st.matches * 1000000) // st.m_union AS jaccard_ppm,
        |  CASE WHEN st.m_union < 64 THEN st.m_union
        |       ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(st.kth AS DOUBLE)) AS BIGINT)
        |  END AS est_union,
        |  (st.matches * (CASE WHEN st.m_union < 64 THEN st.m_union
        |       ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(st.kth AS DOUBLE)) AS BIGINT)
        |  END)) // st.m_union AS est_intersect
        |FROM st, ex""".stripMargin) { (s, d) =>
      val el = T.documents(s, d).select(
        // unbounded substring + BIGINT on BOTH engines, and TRY_CAST on
        // BOTH engines: this session runs ANSI mode (a plain Spark cast
        // would RAISE on a non-numeric suffix where DuckDB's TRY_CAST
        // nulls), so the Spark side must use try_cast too — a
        // non-numeric suffix yields NULL on both engines and the doc is
        // excluded from BOTH shards (NULL fails both in_a filters).
        // Bounded numeric suffixes (the fixture universe) split
        // identically either way; try_cast pins the failure MODE to match.
        (expr("try_cast(substring(source, 4) as bigint)") % 2 === 0).as("in_a"),
        conv(substring(md5(norm(col("text"))), 1, 15), 16, 10)
          .cast(LongType).as("h60"))
      val da = el.filter(col("in_a")).select(col("h60")).distinct()
        .localCheckpoint(eager = true) // two consumers: sketch + exact counts
      val db = el.filter(!col("in_a")).select(col("h60")).distinct()
        .localCheckpoint(eager = true)
      val kmin = udaf(graft.functions.BoundedTopK[Long](64))
      val ka = da.agg(kmin(col("h60"), col("h60")).as("ta"))
        .select(expr("transform(ta, x -> x._1)").as("va"))
      val kb = db.agg(kmin(col("h60"), col("h60")).as("tb"))
        .select(expr("transform(tb, x -> x._1)").as("vb"))
      val ex = da.agg(count(lit(1)).as("n_a"))
        .crossJoin(db.agg(count(lit(1)).as("n_b")))
        .crossJoin(da.join(db, Seq("h60")).agg(count(lit(1)).as("n_inter_exact")))
      ka.crossJoin(kb).crossJoin(ex)
        .withColumn("hu", expr(
          "slice(array_sort(array_distinct(concat(va, vb))), 1, 64)"))
        .withColumn("m_union", size(col("hu")).cast(LongType))
        .withColumn("matches", expr(
          "cast(size(filter(hu, x -> array_contains(va, x) AND array_contains(vb, x))) as bigint)"))
        .withColumn("kth", expr("element_at(hu, cast(m_union as int))"))
        .withColumn("est_union", expr(
          "CASE WHEN m_union < 64 THEN m_union " +
            "ELSE cast(floor(63.0D * 1152921504606846976.0D / cast(kth as double)) as bigint) END"))
        .select(col("n_a"), col("n_b"), col("n_inter_exact"), col("m_union"),
          col("matches"),
          expr("(matches * 1000000) div m_union").as("jaccard_ppm"),
          col("est_union"),
          expr("(matches * est_union) div m_union").as("est_intersect"))
    },

    // Deterministic stratified downsampling (dataset curation): keep every
    // 5th document per language stratum by doc_id order — systematic
    // sampling, reproducible across engines and runs (rand()-based
    // sampleBy is not), with the per-stratum before/after profile.
    Q(
      "tx_stratified_sample",
      """WITH ranked AS (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |  COUNT(*) FILTER (WHERE rn % 5 = 1) AS n_sampled,
        |  MIN(CASE WHEN rn % 5 = 1 THEN doc_id END) AS first_sampled
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
      T.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("rn") % 5 === 1, 1)).as("n_sampled"),
          min(when(col("rn") % 5 === 1, col("doc_id"))).as("first_sampled"))
        .orderBy(col("lang"))
    },

    // Document fingerprinting: md5 of normalized text (full 128-bit) plus a
    // 64-bit hex prefix — the key space exact dedup shuffles on.
    Q(
      "tx_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp128,
        |  substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) AS fp64
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      T.documents(s, d).select(
          col("doc_id"),
          md5(norm(col("text"))).as("fp128"),
          substring(md5(norm(col("text"))), 1, 16).as("fp64"))
        .orderBy(col("doc_id"))
    },

    // Rolling-hash fingerprint: minimum Rabin-Karp hash over all 16-char
    // windows (winnowing-lite) via the custom O(n) rolling expression —
    // the oracle recomputes it declaratively in O(n·w) with precomputed
    // power-of-B constants, pinning the exact modular arithmetic.
    Q(
      "tx_rolling_fp", {
        val w = 16
        val consts = (0 until w).map(j =>
          BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
        val terms = consts.zipWithIndex.map { case (c, j) =>
          s"CAST(ascii(substr(text, CAST(i + $j AS INTEGER), 1)) AS BIGINT) * $c"
        }.mkString(" + ")
        s"""SELECT doc_id,
           |  CASE WHEN length(text) < $w THEN NULL ELSE
           |    list_min(list_transform(range(1, length(text) - ${w - 2}),
           |      i -> ($terms) % ${RollingHash.M}))
           |  END AS rfp,
           |  greatest(length(text) - ${w - 1}, 0) AS n_windows
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      T.documents(s, d).select(
          col("doc_id"),
          toCol(RollingMinHashExpr(toExpr(col("text")), 16)).as("rfp"),
          greatest(length(col("text")) - 15, lit(0)).cast(LongType).as("n_windows"))
        .orderBy(col("doc_id"))
    },

    // EXACT repeated-substring profile (the signal behind exact-substring
    // dedup, Lee et al. 2022 "Deduplicating Training Data Makes Language
    // Models Better"): per document, the fraction of its DISTINCT 16-char
    // window hashes that also occur in at least one other document —
    // catches verbatim cross-document reuse at a granularity winnow
    // near-dup (which samples windows) deliberately blurs. Shapes: the
    // window hashes are a narrow codegen'd map (the same O(n·w) polynomial
    // both engines compute), then TWO map-side-combining shuffles — df per
    // hash, counts per doc — with the hash⇄doc join co-partitioned on the
    // hash key it just aggregated on. Nothing is corpus² and no window
    // function touches the exploded stream; the fan-out is bounded at one
    // df row per (doc, hash). Sub-16-char docs report zero windows and a
    // NULL fraction on both engines.
    Q(
      "dd_substring", {
        val w = 16
        val consts = (0 until w).map(j =>
          BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
        val terms = consts.zipWithIndex.map { case (c, j) =>
          s"CAST(ascii(substr(text, CAST(i + $j AS INTEGER), 1)) AS BIGINT) * $c"
        }.mkString(" + ")
        s"""WITH hs AS (
           |  SELECT doc_id,
           |    CASE WHEN length(text) < $w THEN []
           |      ELSE list_distinct(list_transform(range(1, length(text) - ${w - 2}),
           |        i -> ($terms) % ${RollingHash.M}))
           |    END AS hd
           |  FROM documents),
           |f AS (SELECT doc_id, unnest(hd) AS h FROM hs),
           |dfh AS (SELECT h, count(*) AS df FROM f GROUP BY h),
           |agg AS (
           |  SELECT f.doc_id, count(*) AS n_win,
           |    CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
           |  FROM f JOIN dfh d USING (h) GROUP BY f.doc_id)
           |SELECT hs.doc_id,
           |  COALESCE(a.n_win, 0) AS n_win,
           |  COALESCE(a.n_shared, 0) AS n_shared,
           |  CASE WHEN a.n_win > 0
           |    THEN CAST(a.n_shared AS DOUBLE)/a.n_win ELSE NULL END AS dup_frac
           |FROM hs LEFT JOIN agg a USING (doc_id)
           |ORDER BY hs.doc_id""".stripMargin
      }) { (s, d) =>
      val w = 16
      val consts = (0 until w).map(j =>
        BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
      val terms = consts.zipWithIndex.map { case (c, j) =>
        s"cast(ascii(substring(text, i + $j, 1)) as bigint) * ${c}L"
      }.mkString(" + ")
      val docs = T.documents(s, d).select(col("doc_id"),
        expr(s"""CASE WHEN length(text) < $w THEN array()
                 | ELSE array_distinct(transform(sequence(1, length(text) - ${w - 1}),
                 |   i -> ($terms) % ${RollingHash.M}L)) END""".stripMargin).as("hd"))
      val f = docs.select(col("doc_id"), explode(col("hd")).as("h"))
      val dfh = f.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val agg = f.join(dfh, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_win"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      docs.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_win"), lit(0L)).as("n_win"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          when(col("n_win") > 0,
            col("n_shared").cast(DoubleType) / col("n_win")).as("dup_frac"))
        .orderBy(col("doc_id"))
    },

    // EXACT-SUBSTRING REMOVAL transform (round 14, the other half of Lee
    // et al. 2022: production substring dedup doesn't just SCORE the
    // signal dd_substring computes — it CUTS the duplicated spans and
    // keeps the rest of the document). Shared hash definition with
    // dd_substring (the same 16-char Rabin-Karp windows, the same
    // df ≥ 2 across-document duplication test over per-doc-distinct
    // hashes), so the transform can never drift from the signal it acts
    // on. A char is covered when any duplicated window contains it;
    // maximal covered runs (starts merged at gap ≤ 16) of ≥ 50 chars are
    // excised and the document reconstructed from the kept segments —
    // per-doc byte accounting reconciles exactly: orig_len = cut_len +
    // bytes_cut on every row.
    //
    // Shapes: the window hashes are the narrow codegen'd polynomial map;
    // df and the start join are two co-partitioned keyed shuffles (the
    // dd_substring plan); span merging is lag + running-sum windows
    // PARTITIONED BY doc_id — per-key input bounded by document length,
    // never a global or pair-stream window; the rebuild is one
    // groupBy(doc_id) whose per-doc payload is the CUT-SPAN segments
    // (dup-structure-sized, not corpus-sized). Docs with no duplicated
    // ≥50-char run pass through byte-identical via the left join.
    Q(
      "tx_substring_cut", {
        val w = 16
        val consts = (0 until w).map(j =>
          BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
        val terms = consts.zipWithIndex.map { case (c, j) =>
          s"CAST(ascii(substr(text, CAST(i + $j AS INTEGER), 1)) AS BIGINT) * $c"
        }.mkString(" + ")
        s"""WITH hsq AS (
           |  SELECT doc_id, text, length(text) AS n,
           |    CASE WHEN length(text) < $w THEN []
           |      ELSE list_transform(range(1, length(text) - ${w - 2}),
           |        i -> ($terms) % ${RollingHash.M})
           |    END AS hl
           |  FROM documents),
           |fp AS (SELECT doc_id, unnest(hl) AS h,
           |         unnest(range(1, CAST(len(hl) + 1 AS BIGINT))) AS i FROM hsq),
           |dups AS (SELECT h FROM (
           |    SELECT h, count(*) AS df
           |    FROM (SELECT DISTINCT doc_id, h FROM fp) GROUP BY h) WHERE df >= 2),
           |st AS (SELECT doc_id, i FROM fp JOIN dups USING (h)),
           |lg AS (SELECT doc_id, i,
           |    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM st),
           |sid AS (SELECT doc_id, i,
           |    sum(CASE WHEN prev IS NULL OR i - prev > $w THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS span_id
           |  FROM lg),
           |sp AS (SELECT doc_id, span_id, min(i) AS s, max(i) + ${w - 1} AS e
           |       FROM sid GROUP BY 1, 2),
           |cutsp AS (SELECT doc_id, s, e FROM sp WHERE e - s + 1 >= $MinCutSpan),
           |seg AS (SELECT doc_id, s, e,
           |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS seg_start
           |  FROM cutsp),
           |pieces AS (SELECT g.doc_id,
           |    string_agg(substr(d.text, CAST(g.seg_start AS INTEGER),
           |      CAST(g.s - g.seg_start AS INTEGER)), '' ORDER BY g.s) AS kept_head,
           |    max(g.e) AS last_e,
           |    CAST(sum(g.e - g.s + 1) AS BIGINT) AS bytes_cut,
           |    CAST(count(*) AS BIGINT) AS n_spans_cut
           |  FROM seg g JOIN hsq d USING (doc_id) GROUP BY g.doc_id),
           |fin AS (SELECT h2.doc_id,
           |    CASE WHEN p.doc_id IS NULL THEN h2.text
           |         ELSE p.kept_head || substr(h2.text, CAST(p.last_e + 1 AS INTEGER))
           |    END AS cut_text,
           |    CAST(h2.n AS BIGINT) AS orig_len,
           |    coalesce(p.bytes_cut, 0) AS bytes_cut,
           |    coalesce(p.n_spans_cut, 0) AS n_spans_cut
           |  FROM hsq h2 LEFT JOIN pieces p USING (doc_id))
           |SELECT doc_id, orig_len, CAST(length(cut_text) AS BIGINT) AS cut_len,
           |  bytes_cut, n_spans_cut, cut_text
           |FROM fin ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      val w = 16
      val consts = (0 until w).map(j =>
        BigInt(RollingHash.B).modPow(BigInt(w - 1 - j), BigInt(RollingHash.M)).toLong)
      val terms = consts.zipWithIndex.map { case (c, j) =>
        s"cast(ascii(substring(text, i + $j, 1)) as bigint) * ${c}L"
      }.mkString(" + ")
      val docs = T.documents(s, d).select(col("doc_id"), col("text"),
        length(col("text")).cast(LongType).as("n"),
        expr(s"""CASE WHEN length(text) < $w THEN array()
                 | ELSE transform(sequence(1, length(text) - ${w - 1}),
                 |   i -> ($terms) % ${RollingHash.M}L) END""".stripMargin).as("hl"))
      val fp = docs.select(col("doc_id"),
          posexplode(col("hl")).as(Seq("p0", "h")))
        .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("i"), col("h"))
      val dups = fp.select(col("doc_id"), col("h")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("h"))
      val st = fp.join(dups, Seq("h")).select(col("doc_id"), col("i"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val sid = st
        .withColumn("prev", lag(col("i"), 1).over(wDoc))
        .withColumn("brk",
          when(col("prev").isNull || col("i") - col("prev") > w, 1L).otherwise(0L))
        .withColumn("span_id", sum(col("brk")).over(
          wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sp = sid.groupBy(col("doc_id"), col("span_id"))
        .agg(min(col("i")).as("s"), (max(col("i")) + (w - 1)).as("e"))
      val cutsp = sp.filter(col("e") - col("s") + 1 >= MinCutSpan)
      val wSpan = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      val seg = cutsp
        .withColumn("seg_start", coalesce(lag(col("e"), 1).over(wSpan), lit(0L)) + 1)
      val pieces = seg.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("piece",
          expr("substring(text, cast(seg_start as int), cast(s - seg_start as int))"))
        .groupBy(col("doc_id"))
        .agg(
          array_join(expr(
            "transform(sort_array(collect_list(struct(s, piece))), x -> x.piece)"),
            "").as("kept_head"),
          max(col("e")).as("last_e"),
          sum(col("e") - col("s") + 1).as("bytes_cut"),
          count(lit(1)).as("n_spans_cut"))
      docs.join(pieces, Seq("doc_id"), "left")
        .withColumn("cut_text",
          when(col("last_e").isNull, col("text"))
            .otherwise(concat(col("kept_head"),
              expr("substring(text, cast(last_e + 1 as int))"))))
        .select(col("doc_id"),
          col("n").as("orig_len"),
          length(col("cut_text")).cast(LongType).as("cut_len"),
          coalesce(col("bytes_cut"), lit(0L)).as("bytes_cut"),
          coalesce(col("n_spans_cut"), lit(0L)).as("n_spans_cut"),
          col("cut_text"))
        .orderBy(col("doc_id"))
    },

    // ── Deduplication ─────────────────────────────────────────────────────

    // Winnowing near-dup (the MOSS scheme over tx_rolling_fp's hashes):
    // each doc carries the min hash of every 32-window over its 16-char
    // rolling hashes (custom array expression, O(n·k)); candidate pairs
    // share a df-capped fingerprint; near-dups share at least 2. Two docs
    // sharing any ≥47-char contiguous run are guaranteed a common
    // fingerprint. The oracle recomputes the same set declaratively with
    // list slicing.
    Q(
      "dd_winnow",
      s"""WITH $WinnowPairsCte
         |SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      winnowPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // DIRECTIONAL containment (quote/subset detection — the asymmetric
    // relation near-dup symmetric Jaccard misses): `inner` is contained in
    // `outer` when >= 60% of inner's DISCRIMINATIVE (df-capped) winnow
    // fingerprints also appear in outer. Numerator and denominator share
    // ONE universe — the same df ≤ 20 fingerprint set the pair stage
    // counts shared hits in. (Round 5 divided the capped numerator by the
    // UNCAPPED per-doc count, which systematically deflated quote-heavy
    // docs whose shared fingerprints are common and, under replica-heavy
    // corpora, paid a full per-(doc,fp) aggregation over the uncapped
    // table — the capped universe SHRINKS when replication pushes
    // fingerprints past the cap, so this is also what holds the 8× scale
    // ratio down.) Each undirected pair expands to its two directions;
    // candidate volume is the winnow pair graph, never all-pairs. A
    // containment-heavy corpus (news wire + quoting blogs) dedups on this
    // where plain near-dup keeps both.
    Q(
      "dd_containment",
      s"""WITH $WinnowPairsCte,
         |cnt AS (SELECT doc_id, count(*) AS nfp
         |        FROM (SELECT unnest(docs) AS doc_id FROM grouped) GROUP BY doc_id),
         |dirp AS (
         |  SELECT doc_a AS inner_id, doc_b AS outer_id, n_shared FROM pairs WHERE n_shared >= 2
         |  UNION ALL
         |  SELECT doc_b AS inner_id, doc_a AS outer_id, n_shared FROM pairs WHERE n_shared >= 2)
         |SELECT p.inner_id, p.outer_id, p.n_shared, c.nfp AS n_fp_inner,
         |  CAST(p.n_shared AS DOUBLE)/c.nfp AS containment
         |FROM dirp p JOIN cnt c ON c.doc_id = p.inner_id
         |WHERE CAST(p.n_shared AS DOUBLE)/c.nfp >= 0.6
         |ORDER BY inner_id, outer_id""".stripMargin) { (s, d) =>
      // both sides read the memoized winnow artifact (pairs + per-doc
      // capped counts) — the same per-snapshot build every other winnow
      // consumer reads; its cold cost is the text_winnow_pairs row of the
      // bench's artifact pass
      val art = winnowArtifacts(s, d)
      val cnt = art.fpCounts
      val pairs = art.pairs
      val dirp = pairs
        .select(col("doc_a").as("inner_id"), col("doc_b").as("outer_id"), col("n_shared"))
        .union(pairs
          .select(col("doc_b").as("inner_id"), col("doc_a").as("outer_id"), col("n_shared")))
      dirp.join(cnt.withColumnRenamed("doc_id", "inner_id"), Seq("inner_id"))
        .withColumn("containment", col("n_shared").cast(DoubleType) / col("nfp"))
        .filter(col("containment") >= 0.6)
        .select(col("inner_id"), col("outer_id"), col("n_shared"),
          col("nfp").as("n_fp_inner"), col("containment"))
        .orderBy(col("inner_id"), col("outer_id"))
    },

    // Near-dup CLUSTERING — the end product of the dedup pipeline: the
    // winnow pair graph collapsed into connected components, cluster id =
    // min doc_id (the canonical document). Spark side: the
    // `connectedComponents` helper below — min-label propagation with
    // POINTER JUMPING, O(log diameter) rounds, loud failure instead of
    // silent wrong labels if the round cap is ever hit. Oracle:
    // recursive-CTE transitive closure, min reachable node.
    Q(
      "dd_cluster",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
         |SELECT l.doc_id, l.cluster_id, c.n_members
         |FROM lab l JOIN (SELECT cluster_id, COUNT(*) AS n_members FROM lab
         |                 GROUP BY cluster_id) c USING (cluster_id)
         |ORDER BY l.doc_id""".stripMargin) { (s, d) =>
      val labels = clusterLabels(s, d)
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      labels.select(col("doc_id"), col("label").as("cluster_id"))
        .join(sizes.select(col("label").as("cluster_id"), col("n_members")), Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    },

    // INCREMENTAL CC maintenance receipt (round 13) — the lifecycle row of
    // the union-find merge that keeps [[clusterLabels]] from being a full
    // CC rebuild per corpus snapshot: base labels = CC over the prior
    // snapshot's pairs (both endpoints below the 90% doc-id cut), the
    // admitted batch's pairs fold in via mergeLabels (CC over the
    // CONDENSED graph only). The Spark side reads the base + incrementally
    // merged artifacts; the ORACLE replays base CC and the FULL-graph CC
    // independently — so a hash match IS the proof that incremental ≡ full
    // rebuild on the composed snapshot (the merge algebra
    // CC(P ∪ Q) = merge(CC(P), Q) holds for any edge partition;
    // ClusterSpec pins it on random partitions too). One summary row;
    // every count is N-bounded aggregation over memoized artifacts.
    Q(
      "dd_incremental_cc",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |cutv AS (SELECT (max(doc_id)*9)//10 AS cut FROM documents),
         |oldp AS (SELECT a, b FROM p2, cutv WHERE a < cut AND b < cut),
         |oedges AS (SELECT a, b FROM oldp UNION SELECT b, a FROM oldp),
         |onodes AS (SELECT DISTINCT a AS d FROM oedges),
         |oreach(src, dst) AS (
         |  SELECT d, d FROM onodes
         |  UNION
         |  SELECT r.src, e.b FROM oreach r JOIN oedges e ON r.dst = e.a),
         |olab AS (SELECT src AS doc_id, MIN(dst) AS label FROM oreach GROUP BY src),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |flab AS (SELECT src AS doc_id, MIN(dst) AS label FROM reach GROUP BY src)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM olab) AS n_base_docs,
         |  (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM olab) AS n_base_clusters,
         |  (SELECT CAST(count(*) AS BIGINT) FROM p2, cutv
         |     WHERE a >= cut OR b >= cut) AS n_new_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM flab) AS n_docs,
         |  (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM flab) AS n_clusters,
         |  (SELECT CAST(count(*) AS BIGINT) FROM olab o JOIN flab f USING (doc_id)
         |     WHERE o.label <> f.label) AS n_relabeled,
         |  (SELECT CAST(count(*) AS BIGINT) FROM flab f
         |     LEFT JOIN olab o USING (doc_id)
         |     WHERE o.doc_id IS NULL) AS n_newly_labeled""".stripMargin) { (s, d) =>
      val base = clusterLabelsBase(s, d)
      val merged = clusterLabels(s, d)
      val cut = snapshotCut(s, d)
      val newp = winnowPairs(s, d)
        .filter(col("doc_a") >= cut || col("doc_b") >= cut)
      val chg = base.select(col("doc_id"), col("label").as("bl"))
        .join(merged.select(col("doc_id"), col("label").as("ml")), Seq("doc_id"))
        .filter(col("bl") =!= col("ml"))
      val fresh = merged.join(base.select(col("doc_id")), Seq("doc_id"), "left_anti")
      base.agg(count(lit(1)).as("n_base_docs"),
          countDistinct(col("label")).as("n_base_clusters"))
        .crossJoin(newp.agg(count(lit(1)).as("n_new_pairs")))
        .crossJoin(merged.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("label")).as("n_clusters")))
        .crossJoin(chg.agg(count(lit(1)).as("n_relabeled")))
        .crossJoin(fresh.agg(count(lit(1)).as("n_newly_labeled")))
    },

    // SOFT dedup (round 12) — the down-WEIGHT alternative to dropping:
    // instead of electing one survivor per near-dup cluster, every member
    // keeps weight 1/|cluster| (ppm-scaled), so the cluster contributes
    // ONE document's worth of training mass however many copies exist —
    // the reweighting form of dedup used when hard drops are too lossy
    // (templated-but-distinct pages) or when the sampler downstream wants
    // a weight column (tx_weighted_sample's contract). Unclustered docs
    // are their own singleton (weight exactly 10^6). Cost on top of the
    // memoized cluster artifact: one size agg + one keyed join — no new
    // pair work at any scale.
    Q(
      "tx_soft_dedup",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |fcl AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab l USING (doc_id)),
         |siz AS (SELECT cluster_id, COUNT(*) AS n_members FROM fcl GROUP BY cluster_id)
         |SELECT f.doc_id, f.cluster_id, s.n_members,
         |  CAST(1000000 // s.n_members AS BIGINT) AS weight_ppm
         |FROM fcl f JOIN siz s USING (cluster_id)
         |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
      val full = T.documents(s, d).select(col("doc_id"))
        .join(clusterLabels(s, d).select(col("doc_id"), col("label")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      val siz = full.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
      full.join(siz, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("n_members"),
          expr("1000000 div n_members").as("weight_ppm"))
        .orderBy(col("doc_id"))
    },

    // Dedup threshold SENSITIVITY curve (round 12) — the tuning table an
    // operator reads before picking the shared-fingerprint threshold τ:
    // for τ = 2..6, how many candidate pairs survive, how many documents
    // get flagged, and the corpus dup-rate — the precision/recall dial of
    // the winnow family in one row per τ (dd_winnow ships τ = 2; this
    // shows what 3..6 would have done WITHOUT re-running the pipeline;
    // τ = 1 is not derivable from the memoized τ ≥ 2 pair artifact and a
    // 1-shared hit is band noise by construction, so the curve starts at
    // the shipped threshold).
    // Cost: one pass over the memoized pair graph × 5 grid rows + a
    // bounded per-τ distinct; no new fingerprint work at any scale.
    Q(
      "dd_threshold_curve",
      s"""WITH $WinnowPairsCte,
         |taus AS (SELECT unnest(range(2, 7)) AS tau),
         |hit AS (
         |  SELECT t.tau, p.doc_a, p.doc_b FROM pairs p JOIN taus t
         |  ON p.n_shared >= t.tau),
         |pc AS (SELECT tau, count(*) AS n_pairs FROM hit GROUP BY tau),
         |dc AS (SELECT tau, count(*) AS n_docs_flagged FROM (
         |         SELECT DISTINCT tau, doc_id FROM (
         |           SELECT tau, doc_a AS doc_id FROM hit
         |           UNION ALL SELECT tau, doc_b FROM hit))
         |       GROUP BY tau),
         |tot AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT t.tau, coalesce(pc.n_pairs, 0) AS n_pairs,
         |  coalesce(dc.n_docs_flagged, 0) AS n_docs_flagged,
         |  (coalesce(dc.n_docs_flagged, 0) * 1000000) // tot.n_docs AS dup_rate_ppm
         |FROM taus t LEFT JOIN pc ON pc.tau = t.tau
         |LEFT JOIN dc ON dc.tau = t.tau, tot
         |ORDER BY t.tau""".stripMargin) { (s, d) =>
      val pairs = winnowPairs(s, d)
      val hit = pairs
        .select(col("n_shared"), col("doc_a"), col("doc_b"),
          explode(expr("sequence(2, 6)")).as("tau"))
        .filter(col("n_shared") >= col("tau"))
      val pc = hit.groupBy(col("tau")).agg(count(lit(1)).as("n_pairs"))
      val dc = hit
        .select(col("tau"), explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
        .groupBy(col("tau")).agg(count(lit(1)).as("n_docs_flagged"))
      val tot = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val taus = s.range(2, 7).select(col("id").as("tau"))
      taus
        .join(pc, Seq("tau"), "left")
        .join(dc, Seq("tau"), "left")
        .crossJoin(broadcast(tot))
        .select(col("tau"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"),
          expr("(coalesce(n_docs_flagged, 0) * 1000000) div n_docs").as("dup_rate_ppm"))
        .orderBy(col("tau"))
    },

    // ENSEMBLE (multi-signal) dedup — the fused verdict a production
    // curation run actually ships: a document is a duplicate if the TEXT
    // signal (winnow fingerprint pairs, ≥2 shared) OR the EMBEDDING signal
    // (SemDeDup within-cluster cosine ≥ 0.4 pairs, VectorOps.semanticPairs;
    // vec_id keys the documents' embedding rows 1:1) connects it to a
    // lower-id canonical — connected components over the UNION graph, so
    // a surface-rewritten near-dup (text misses, embedding catches) and a
    // same-template paraphrase (embedding misses, text catches) both fold
    // into one cluster instead of surviving whichever single-signal sweep
    // ran. Per-doc flags record which signal(s) fired — the audit column a
    // dedup report needs. Cost = the two pair graphs both already bounded
    // (df-capped fingerprint groups; per-class pair counts) + the MEMOIZED
    // ensemble CC artifact (ensembleLabels — built once per snapshot like
    // clusterLabels, timed in the bench's cold pass); the final verdict is
    // three left joins on doc_id.
    Q(
      "dd_ensemble",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |${graft.operators.VectorOps.SemanticPairsSqlCtes},
         |tpair AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |epair AS (SELECT vec_a AS a, vec_b AS b FROM ep),
         |upair AS (SELECT a, b FROM tpair UNION SELECT a, b FROM epair),
         |edges AS (SELECT a, b FROM upair UNION SELECT b, a FROM upair),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS did, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |tflag AS (SELECT DISTINCT x AS did FROM
         |  (SELECT a AS x FROM tpair UNION ALL SELECT b FROM tpair)),
         |eflag AS (SELECT DISTINCT x AS did FROM
         |  (SELECT a AS x FROM epair UNION ALL SELECT b FROM epair))
         |SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |  COALESCE(l.cluster_id, d.doc_id) <> d.doc_id AS is_dropped,
         |  (t.did IS NOT NULL) AS text_dup, (e.did IS NOT NULL) AS embed_dup
         |FROM documents d LEFT JOIN lab l ON l.did = d.doc_id
         |LEFT JOIN tflag t ON t.did = d.doc_id
         |LEFT JOIN eflag e ON e.did = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val tpair = winnowPairs(s, d).select(col("doc_a"), col("doc_b"))
      val epair = VectorOps.semanticPairs(s, d)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      val labels = ensembleLabels(s, d)
      val tdocs = tpair
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct().withColumn("t1", lit(true))
      val edocs = epair
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct().withColumn("e1", lit(true))
      T.documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .join(tdocs, Seq("doc_id"), "left")
        .join(edocs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("cluster_id"),
          (coalesce(col("label"), col("doc_id")) =!= col("doc_id")).as("is_dropped"),
          col("t1").isNotNull.as("text_dup"),
          col("e1").isNotNull.as("embed_dup"))
        .orderBy(col("doc_id"))
    },

    // LEAKAGE-SAFE train/val split: the naive per-document hash split puts
    // near-duplicate documents on both sides (the val set then "measures"
    // memorization of training twins). Split by near-dup CLUSTER instead:
    // every member of a winnow-pair connected component hashes on its
    // cluster id, singletons on their own doc_id, so a whole duplicate
    // family lands on ONE side by construction. ~10% val via a 60-bit md5
    // hash of the cluster id — deterministic, engine-independent, no RNG
    // state. Spark cost = dd_cluster (the CC label pass) + one narrow map;
    // the split itself adds no shuffle beyond the label join.
    Q(
      "tx_train_val_split",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
         |SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |  CASE WHEN (${sid60Sql(
             "CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)")} % 100) < 10
         |    THEN 'val' ELSE 'train' END AS side
         |FROM documents d LEFT JOIN lab l USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val labels = clusterLabels(s, d)
      T.documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
        .withColumn("side",
          when(sid60(col("cluster_id").cast(StringType)) % 100L < 10L, "val")
            .otherwise("train"))
        .select(col("doc_id"), col("cluster_id"), col("side"))
        .orderBy(col("doc_id"))
    },

    // End-to-end curation funnel — the composite a training-data pipeline
    // actually runs: exact dedup (keep min doc_id per normalized
    // fingerprint) → near-dup drop (greedy: the larger doc_id of every
    // winnow pair is dropped — the practical shortcut to full clustering;
    // dd_cluster is the exact variant) → quality gate (composite score ≥
    // 0.5) — reported as a per-language survival funnel.
    Q(
      "tx_curation",
      s"""WITH $WinnowPairsCte,
         |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE n_shared >= 2),
         |exact_keep AS (SELECT doc_id FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (
         |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1),
         |quality AS (
         |  SELECT doc_id, ${qualityScoreSql("l")} AS q
         |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))
         |SELECT d.lang,
         |  COUNT(*) AS n_in,
         |  COUNT(*) FILTER (WHERE e.doc_id IS NOT NULL) AS n_after_exact,
         |  COUNT(*) FILTER (WHERE e.doc_id IS NOT NULL AND dr.doc_id IS NULL) AS n_after_neardup,
         |  COUNT(*) FILTER (WHERE e.doc_id IS NOT NULL AND dr.doc_id IS NULL AND q.q >= 0.5) AS n_final
         |FROM documents d
         |LEFT JOIN exact_keep e USING (doc_id)
         |LEFT JOIN dropped dr USING (doc_id)
         |JOIN quality q USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d)
      val dropped = winnowPairs(s, d)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("is_dropped", lit(true))
      val wExact = Window.partitionBy(md5(norm(col("text")))).orderBy(col("doc_id"))
      val exactKeep = docs
        .withColumn("rn", row_number().over(wExact)).filter(col("rn") === 1)
        .select(col("doc_id")).withColumn("is_exact_keep", lit(true))
      val quality = docs
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), qualityScore("l").as("q"))
      docs.select(col("doc_id"), col("lang"))
        .join(exactKeep, Seq("doc_id"), "left")
        .join(dropped, Seq("doc_id"), "left")
        .join(quality, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_in"),
          count(when(col("is_exact_keep"), 1)).as("n_after_exact"),
          count(when(col("is_exact_keep") && col("is_dropped").isNull, 1)).as("n_after_neardup"),
          count(when(col("is_exact_keep") && col("is_dropped").isNull && col("q") >= 0.5, 1))
            .as("n_final"))
        .orderBy(col("lang"))
    },

    // Exact dedup: hash-groupBy on the normalized-text fingerprint; one
    // shuffle on a 128-bit key (uniform — no skew), canonical = min doc_id.
    Q(
      "dd_exact",
      """SELECT fp, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |      FROM documents)
        |GROUP BY fp ORDER BY fp""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), md5(norm(col("text"))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("fp"))
    }.copy(bench = true),

    // n-gram Jaccard near-dup: word 3-gram shingle sets; candidate pairs
    // share a shingle with document frequency <= 20 (the df cap bounds join
    // fan-out at scale — frequent shingles generate quadratic candidates and
    // near-zero signal); Jaccard computed over the rare-shingle space.
    // Plan shape: ONE shuffle groups each shingle's (<=20) doc list; pairs
    // are expanded inside the row (<=190 per shingle, bounded by the df
    // cap), so there is no shingle-keyed self-join. At 100 TB the grouped
    // relation would be persisted before its two consumers (pair expansion +
    // per-doc counts) rather than recomputed.
    Q(
      "dd_ngram_jaccard",
      """WITH sh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-2,0)+1),
        |           i -> l[i]||' '||l[i+1]||' '||l[i+2])) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)),
        |sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh0),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20),
        |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(common AS DOUBLE)/(ca.n + cb.n - common) AS jaccard
        |FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
        |WHERE CAST(common AS DOUBLE)/(ca.n + cb.n - common) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val sh = T.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(shinglesSpark)).as("shingle"))
      // one shuffle: df-capped doc list per shingle. Checkpointed because
      // two aggregation grains consume it (per-doc counts + per-pair
      // counts) — the batch analog of checkpointing the shingle index,
      // which is tiny relative to the corpus. localCheckpoint keeps the
      // pin out of the session CacheManager (cache-hygiene rule).
      val grouped = sh.groupBy(col("shingle"))
        .agg(collect_list(col("doc_id")).as("docs"))
        .filter(size(col("docs")) <= 20)
        .localCheckpoint(eager = true)
      val cnt = grouped.select(explode(col("docs")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // in-row pair expansion: docs × docs filtered a<b (<=190 pairs/shingle)
      val pairs = grouped
        .select(explode(expr(
          "flatten(transform(docs, x -> filter(transform(docs, y -> struct(x AS a, y AS b)), p -> p.a < p.b)))"))
          .as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
      pairs
        .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("jaccard",
          col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash + banded LSH over word 3-gram shingles: K=16 arithmetic
    // permutations h_k(x) = (x*(31k+7) + (17k+3)) mod P over md5-derived
    // 60-bit shingle ids, 4 bands × 4 rows; candidates collide on a whole
    // band; estimated Jaccard = matching-minhash fraction.
    // Plan shape: the signature is ONE wide aggregation — 16 min columns in
    // a single groupBy(doc_id) (map-side combine, one shuffle) — not a 16×
    // row explode; band keys are row-local concats; the verify step joins
    // the wide signature twice (AQE broadcasts at test scale; hash join on
    // doc_id at 100 TB). No dictionary, no global sort.
    Q(
      "dd_minhash_lsh", {
        val matches = (0 until MhK)
          .map(k => s"(CASE WHEN sa.mh$k=sb.mh$k THEN 1 ELSE 0 END)").mkString("+")
        s"""WITH $MhCandSql
           |SELECT c.doc_a, c.doc_b, ($matches)/16.0 AS est_jaccard
           |FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      // checkpointed: three consumers (band keys + both verify sides)
      // would otherwise recompute the shingle scan; the signature table is
      // 17 ints per doc — negligible next to the corpus. localCheckpoint,
      // not persist: the pin must die with the query (cache-hygiene rule),
      // and dd_sim_topk builds the identical signature frame — a persist()
      // here would alias its plan through the session CacheManager.
      val sig = minhashSignatures(
        T.documents(s, d).select(col("doc_id"), col("text")))
        .localCheckpoint(eager = true)
      val bands = bandTable(sig)
      val cand = bands.as("a").join(bands.as("b"), Seq("band", "band_key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sa = sig.toDF("doc_a" +: (0 until MhK).map(k => s"a$k"): _*)
      val sb = sig.toDF("doc_b" +: (0 until MhK).map(k => s"b$k"): _*)
      val nMatch = (0 until MhK)
        .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), (nMatch / lit(16.0)).as("est_jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }.copy(bench = true),

    // Candidate RECALL of the banded-LSH index against exact-Jaccard truth
    // — the eval a dedup deployment runs before trusting its band
    // parameters (the dd-family analog of ss_recall): every TRUE near-dup
    // pair (full-shingle-set Jaccard >= 1/2, the integer-exact form
    // 3·common >= |A|+|B|) with a found/missed flag from the SHARED
    // candidate definition (MhCandSql — the same CTE dd_minhash_lsh
    // scores). Per-pair rows, not a mean: an aggregate recall would hide
    // which similarity band the 4×4 banding starts missing in. The truth
    // side's exact shingle self-join is the eval's cost — quadratic in
    // the hottest shingle's df — so since round 14 the truth runs on the
    // TruthSampleTarget-bounded deterministic doc sample (the production
    // form; see the constant's scaladoc): size-bounded at any scale, so
    // the replica sweeps cover this row with no skip list, and corpora
    // under the target (every fixture SF) sample everything — identical
    // results to the former uncapped rows. The operators it audits keep
    // their full scope and df caps.
    Q(
      "dd_lsh_recall",
      s"""WITH $MhCandSql,
         |$JaccTruthSql
         |SELECT t.doc_a, t.doc_b, t.common, t.uni,
         |  (c.doc_a IS NOT NULL) AS found
         |FROM truth t LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
         |ORDER BY t.doc_a, t.doc_b""".stripMargin) { (s, d) =>
      val sig = minhashSignatures(T.documents(s, d).select(col("doc_id"), col("text")))
      val bands = bandTable(sig)
      val cand = bands.as("a").join(bands.as("b"), Seq("band", "band_key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      jaccTruth(s, d)
        .join(cand.withColumn("hit", lit(true)), Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("common"), col("uni"),
          coalesce(col("hit"), lit(false)).as("found"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // The SAME recall audit for the OTHER near-dup estimator: simhash's
    // hamming-thresholded VERDICT pairs (not just its block-collision
    // candidates — the operator's actual output) against the SAME exact-
    // Jaccard truth (JaccTruthSql / jaccTruth: one truth definition for
    // both evals). Two estimators, one referee — a banding or threshold
    // change in either operator moves its recall row, never the truth.
    // Same sampled truth scope as dd_lsh_recall (size-bounded, sweepable).
    Q(
      "dd_simhash_recall",
      s"""WITH $ShVerdictSql,
         |$JaccTruthSql
         |SELECT t.doc_a, t.doc_b, t.common, t.uni,
         |  (v.doc_a IS NOT NULL) AS found
         |FROM truth t LEFT JOIN shv v ON v.doc_a = t.doc_a AND v.doc_b = t.doc_b
         |ORDER BY t.doc_a, t.doc_b""".stripMargin) { (s, d) =>
      jaccTruth(s, d)
        .join(simhashVerdicts(s, d).select(col("doc_a"), col("doc_b"))
          .withColumn("hit", lit(true)), Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("common"), col("uni"),
          coalesce(col("hit"), lit(false)).as("found"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // "More like this" — the SERVING primitive over the near-dup index
    // (round 11): for every document, its top-3 most similar OTHER
    // documents by estimated Jaccard, candidates bounded to the banded-LSH
    // collision graph. The text-side analog of ss_knn_graph: the SAME
    // persisted signature/band tables a dedup deployment already maintains
    // double as a document-similarity index, so related-document serving
    // costs no new artifact. Plan: band self-join (df-capped, never
    // all-pairs), BOTH orientations of each collision pair (a pair serves
    // both endpoints' result lists), one 16-int match count per pair
    // inside codegen, then top-3 per query doc via a window partitioned on
    // doc_a — degree-bounded per key, never a global sort. At 100 TB the
    // candidate degree tracks the near-dup structure (the band join's df
    // cap), so the window's per-key input stays small by construction.
    Q(
      "dd_sim_topk", {
        val matches = (0 until MhK)
          .map(k => s"(CASE WHEN sa.mh$k=sb.mh$k THEN 1 ELSE 0 END)").mkString("+")
        s"""WITH $MhCandSql,
           |sym AS (SELECT doc_a, doc_b FROM cand
           |        UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM cand),
           |scored AS (
           |  SELECT s.doc_a, s.doc_b, ($matches)/16.0 AS est_jaccard
           |  FROM sym s JOIN sig sa ON sa.doc_id = s.doc_a
           |  JOIN sig sb ON sb.doc_id = s.doc_b),
           |rk AS (SELECT doc_a, doc_b, est_jaccard,
           |    ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY est_jaccard DESC, doc_b) AS rnk
           |  FROM scored)
           |SELECT doc_a, doc_b, est_jaccard, rnk FROM rk WHERE rnk <= 3
           |ORDER BY doc_a, rnk""".stripMargin
      }) { (s, d) =>
      // checkpointed like dd_minhash_lsh's signature table (four
      // consumers: band keys + both rerank sides), and for the same
      // hygiene reason — the two queries build the identical frame.
      val sig = minhashSignatures(
        T.documents(s, d).select(col("doc_id"), col("text")))
        .localCheckpoint(eager = true)
      val bands = bandTable(sig)
      val cand = bands.as("a").join(bands.as("b"), Seq("band", "band_key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sym = cand.unionByName(
        cand.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val sa = sig.toDF("doc_a" +: (0 until MhK).map(k => s"a$k"): _*)
      val sb = sig.toDF("doc_b" +: (0 until MhK).map(k => s"b$k"): _*)
      val nMatch = (0 until MhK)
        .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
        .reduce(_ + _)
      val w = Window.partitionBy(col("doc_a"))
        .orderBy(col("est_jaccard").desc, col("doc_b"))
      sym.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), (nMatch / lit(16.0)).as("est_jaccard"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 3)
        .orderBy(col("doc_a"), col("rnk"))
    },

    // Incremental NEAR-dup maintenance — the dedup path a daily 100 TB
    // corpus refresh actually runs: a NEW batch (top-10%-of-doc_id slice,
    // same integer cut as dd_incremental) probes the PERSISTED MinHash band
    // index of the existing corpus, minhash-verifies the surviving
    // candidates, and emits an admit/drop verdict per new document — the
    // corpus is never re-clustered and never re-shuffled.
    // Plan shape: the corpus pays exactly its one signature-build shuffle
    // (in production the band/sig tables are persisted, so it pays zero);
    // every join against it BROADCASTS the batch-derived side (band probe,
    // candidate verify), so no corpus-side Exchange exists beyond the
    // signature groupBy — gated in PlanSpec. Reference analog: the
    // insert-if-absent guards (mocsettlement.py:29-52) generalized from
    // exact keys to near-dup signatures.
    Q("dd_incremental_lsh", IncrementalLshSql) { (s, d) =>
      // the same build-index / probe API a production refresh runs as two
      // jobs (NearDupIndexSpec drives the parquet-persisted flow); here
      // the corpus/batch split is the in-query doc_id cut.
      val (corpusSig, newSig) = incrementalSplit(s, d)
      probeNearDupIndex(newSig, corpusSig, bandTable(corpusSig))
    },

    // The SAME incremental near-dup semantics through the LARGE-batch path
    // (shuffle join on the signature-carrying band index, batch side never
    // broadcast) against the SAME oracle — proving broadcast- and
    // shuffle-path equality row for row. This is the plan that survives the
    // daily batch outgrowing Spark's broadcast ceiling; PlanSpec gates that
    // nothing batch-derived broadcasts and the corpus is exchanged at most
    // once (zero with a writeBandIndex-bucketed index, NearDupIndexSpec).
    Q("dd_incremental_lsh_big", IncrementalLshSql) { (s, d) =>
      val (corpusSig, newSig) = incrementalSplit(s, d)
      probeNearDupIndexShuffle(newSig, bandIndex(corpusSig))
    },

    // CROSS-document boilerplate signal (the CCNet-style shared-segment
    // dedup, distinct from tx_repetition's within-doc rules): per document,
    // the fraction of its distinct word 8-gram segments that also occur in
    // at least one OTHER document. Plan shape: distinct (doc, gram-id)
    // pairs shuffle once on the 60-bit gram id for the df count, join back
    // on the same key (co-partitioned — no second gram-side exchange), one
    // per-doc agg; docs too short to segment left-join in with zero. No
    // all-pairs anywhere; the heaviest key's fan-out equals its corpus
    // frequency, the same bound as the scan itself.
    Q(
      "dd_boilerplate",
      s"""WITH g AS (
         |  SELECT DISTINCT doc_id, ${sid60Sql("gram")} AS gid FROM (
         |    SELECT doc_id, array_to_string(l[CAST(i AS INTEGER):CAST(i+7 AS INTEGER)], ' ') AS gram
         |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         |         unnest(range(1, greatest(len(l)-7,0)+1)) AS t(i))),
         |df AS (SELECT gid, count(*) AS df FROM g GROUP BY gid),
         |per AS (SELECT g.doc_id, count(*) AS n_segments,
         |          sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS n_shared
         |        FROM g JOIN df ON df.gid = g.gid GROUP BY g.doc_id)
         |SELECT d.doc_id,
         |  coalesce(per.n_segments, 0) AS n_segments,
         |  coalesce(CAST(per.n_shared AS DOUBLE) / CAST(per.n_segments AS DOUBLE), 0.0) AS shared_frac,
         |  coalesce(CAST(per.n_shared AS DOUBLE) / CAST(per.n_segments AS DOUBLE), 0.0) >= 0.5 AS boilerplate_heavy
         |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val grams = docs
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          "CASE WHEN size(l) >= 8 THEN transform(sequence(1, size(l)-7), i -> concat_ws(' ', slice(l, i, 8))) ELSE cast(array() as array<string>) END")).as("gram"))
        .select(col("doc_id"), (sid60(col("gram"))).as("gid"))
        .distinct()
      val dfCount = grams.groupBy(col("gid")).agg(count(lit(1)).as("df"))
      val per = grams.join(dfCount, Seq("gid"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(when(col("df") >= 2, 1).otherwise(0)).as("n_shared"))
      docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_shared").cast("double") / col("n_segments").cast("double"),
            lit(0.0)).as("shared_frac"),
          (coalesce(col("n_shared").cast("double") / col("n_segments").cast("double"),
            lit(0.0)) >= 0.5).as("boilerplate_heavy"))
    },

    // The MinHash signature again, through the TYPED AGGREGATOR path
    // (graft.functions.MinHashAgg — X5): constant-space sketch buffer with
    // commutative merge, bit-equal to dd_minhash_lsh's wide aggregation;
    // the oracle assembles the same signature as a list. The signature is
    // rendered as a canonical comma-joined string so value comparison is
    // total-order friendly (array cells are not hashable/sortable in every
    // downstream comparator).
    Q(
      "dd_minhash_agg", {
        val mins = (0 until MhK)
          .map(k => s"min((sidp*${31 * k + 7}+${17 * k + 3})%$MhP)").mkString(", ")
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, shingle FROM (
           |    SELECT doc_id, unnest($shinglesSql) AS shingle
           |    FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))),
           |ids AS (SELECT doc_id, ${sid60Sql("shingle")} % $MhP AS sidp FROM sh)
           |SELECT doc_id, array_to_string([$mins], ',') AS sig
           |FROM ids GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(shinglesSpark)).as("shingle"))
        .select(col("doc_id"), (sid60(col("shingle")) % MhP).as("sidp"))
        .as[(Long, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.functions.MinHashAgg.toColumn.name("sig"))
        .toDF("doc_id", "sig")
        .select(col("doc_id"),
          array_join(col("sig").cast("array<string>"), ",").as("sig"))
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup: 60-bit signature from frequency-weighted token-hash
    // bits (md5-derived 60-bit token ids, every signature bit an
    // independent hash bit); near-dup iff hamming <= ShThresh. Plan shape:
    // the 60 signed bit-sums are ONE wide aggregation per doc (single
    // shuffle, map-side combine); candidates come from 4 pigeonhole
    // 15-bit blocks (32,768 buckets each — see the ShBits comment for the
    // round-15 re-banding and its completeness boundary), NOT an all-pairs
    // join — each block-equality bucket bounds fan-out.
    Q(
      "dd_simhash",
      s"""WITH $ShVerdictSql
         |SELECT doc_a, doc_b, hamming FROM shv
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      simhashVerdicts(s, d)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // INTRA-document dedup — repeated-passage removal WITHIN one document
    // (the within-doc analog of dd_boilerplate's cross-doc pass): the token
    // stream is tiled into non-overlapping 3-token chunks, a chunk repeated
    // later in the same document is dropped (first occurrence wins), and
    // the survivors reassemble in original order. The contract covers the
    // tiled region; a 1-2-token tail is out of scope by definition (n_chunks
    // counts tiles). Shapes: one row-local chunking map, two
    // map-side-combining shuffles keyed by (doc_id, chunk) then doc_id —
    // per-doc state is bounded by the doc's own chunk count, so the pass is
    // a linear scan at any corpus size; no cross-document state at all.
    Q(
      "dd_intradoc",
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(cs) AS chunk, unnest(range(0, len(cs))) AS pos
        |  FROM (SELECT doc_id,
        |          list_transform(range(0, len(l)//3),
        |                         k -> l[3*k+1]||' '||l[3*k+2]||' '||l[3*k+3]) AS cs
        |        FROM d)),
        |kept AS (SELECT doc_id, chunk, min(pos) AS keep_pos, count(*) AS n_occ
        |         FROM ch GROUP BY doc_id, chunk),
        |agg AS (SELECT doc_id,
        |          CAST(sum(n_occ) AS BIGINT) AS n_chunks,
        |          CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(chunk, ' ' ORDER BY keep_pos) AS clean_text
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_chunks, 0) AS n_chunks,
        |  coalesce(a.n_kept, 0) AS n_kept,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM d LEFT JOIN agg a USING(doc_id) ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d).select(col("doc_id"), split(col("text"), " ").as("l"))
      // guard the sequence: Spark's sequence(0, -1) would generate a
      // DESCENDING range for a <3-token doc instead of an empty one
      val chunks = docs.select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(l) >= 3
          |THEN transform(sequence(0, (size(l) div 3) - 1),
          |               k -> concat_ws(' ', slice(l, 3*k+1, 3)))
          |ELSE cast(array() as array<string>) END""".stripMargin))
        .as(Seq("pos", "chunk")))
      val kept = chunks.groupBy(col("doc_id"), col("chunk"))
        .agg(min(col("pos")).as("keep_pos"), count(lit(1)).as("n_occ"))
      // collect_list is order-nondeterministic; the array_sort over
      // (keep_pos, chunk) structs restores the deterministic original order
      // (keep_pos is unique per doc — one chunk per position)
      val agg = kept.groupBy(col("doc_id")).agg(
        sum(col("n_occ")).as("n_chunks"),
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("keep_pos"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
      docs.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    },

    // Inverted-index build (the retrieval-side artifact of a training-data
    // pipeline): token → exact df / total_tf plus a BOUNDED posting-list
    // head (the 20 smallest doc_ids) via the BoundedTopK typed Aggregator —
    // the map side partial-aggregates each partition to ≤20 entries per
    // token before the shuffle, so a stop-word's corpus-sized posting list
    // is never materialized anywhere, at any scale (collect_list+sort
    // would carry the full list across the wire AND be nondeterministic).
    // Exact stats and the bounded head come out of ONE grouped pass.
    Q(
      "tx_inverted_index",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)
        |SELECT token, count(*) AS df,
        |  CAST(sum(tf) AS BIGINT) AS total_tf,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
        |FROM tf GROUP BY token ORDER BY token""".stripMargin) { (s, d) =>
      val head20 = udaf(graft.functions.BoundedTopK[Long](20))
      T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
          head20(col("doc_id"), col("doc_id")).as("top"))
        .select(col("token"), col("df"), col("total_tf"),
          // joined-string form: the list is deterministic (BoundedTopK
          // ascending) and the flat column keeps the compare frame hashable
          array_join(transform(col("top"), t => t.getField("_1").cast("string")), ",")
            .as("postings"))
        .orderBy(col("token"))
    },

    // BM25 RETRIEVAL over the corpus (round 12) — reads the memoized
    // [[bm25Postings]] scored-postings artifact (the serving tier's index,
    // ColdBuilds-timed like every other per-snapshot build) — the query side of the
    // inverted index: top-5 documents per query under Okapi BM25 with
    // k1 = 1.2, b = 0.75, INTEGER-EXACT on both engines. The idf leg uses
    // the same log-free (N·10^6 div df) scaling as tx_tfidf (a libm ln()
    // would drift cross-engine in the last ulp); the legs BM25 actually
    // adds — tf saturation and document-length normalization — are exact
    // rationals: with the ×10^4 clearing of k1/b the per-term score is
    //   (idf · 22000 · tf) div (10000·tf + 3000 + (9000·dl·N) div T)
    // (dl = doc length, N = docs, T = total tokens; every operand
    // non-negative so Spark div ≡ DuckDB //). int64 headroom: idf ≤ 10^6·N
    // caps N at ~10^9 docs before the DECIMAL(38,0) discipline applies —
    // documented, not hit here. Plan: the tf/df/dl stats are the SAME
    // grouped passes the index build runs; the 11-term query table joins
    // broadcast; per-(query, doc) scores sum in one keyed agg; top-5 per
    // query via BoundedTopK so the scored stream partial-aggregates to ≤5
    // entries before the final shuffle — never a corpus-sized rank window.
    Q(
      "tx_bm25",
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
         |              (SELECT count(*) FROM toks) AS total_toks),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |qt AS (SELECT * FROM (VALUES ${Bm25Workload.Sql}) AS t(q_id, term)),
         |scored AS (
         |  SELECT qt.q_id, tf.doc_id,
         |    CAST(SUM( (((s.n_docs*1000000)//dfr.df) * 22000 * tf.tf)
         |         // (10000*tf.tf + 3000 + (9000*d.dl*s.n_docs)//s.total_toks) ) AS BIGINT) AS score
         |  FROM qt JOIN tf ON tf.token = qt.term
         |  JOIN dfr ON dfr.token = qt.term
         |  JOIN dl d ON d.doc_id = tf.doc_id, st s
         |  GROUP BY 1, 2)
         |SELECT q_id, doc_id, score, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
      import s.implicits._
      val qt = Bm25Workload.Queries.toDF("q_id", "term")
      val scored = bm25Postings(s, d)
        .join(broadcast(qt), col("token") === col("term"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("term_score")).as("score"))
      val top5 = udaf(graft.functions.BoundedTopK[Long](5))
      scored.groupBy(col("q_id"))
        .agg(top5(-col("score"), col("doc_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("q_id"), col("t._2").as("doc_id"), (-col("t._1")).as("score"),
          (col("r0") + 1).cast(LongType).as("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    },

    // VOCAB COVERAGE by language (round 12) — the tokenizer-sizing
    // analysis a multilingual corpus needs before training: fix the vocab
    // to the top-256 corpus tokens (frequency desc, token asc — a
    // deterministic stand-in for the trained vocab), then per language
    // report total token mass, the ppm covered by the vocab, and the
    // count of out-of-vocab token TYPES — the numbers that decide vocab
    // size and per-language fertility budgets. Plan: one token-frequency
    // agg, top-256 via TakeOrderedAndProject (never a global sort), the
    // 256-row vocab broadcast into a left semi-ish join, one per-lang
    // agg. Coverage stays integer (ppm via non-negative div).
    Q(
      "tx_vocab_coverage",
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        |vocab AS (SELECT token FROM freq ORDER BY cnt DESC, token LIMIT 256),
        |marked AS (
        |  SELECT t.lang, t.token, (v.token IS NOT NULL) AS in_vocab
        |  FROM toks t LEFT JOIN vocab v ON v.token = t.token)
        |SELECT lang, count(*) AS n_tokens,
        |  CAST((count(*) FILTER (WHERE in_vocab)) * 1000000 // count(*) AS BIGINT)
        |    AS coverage_ppm,
        |  count(DISTINCT CASE WHEN NOT in_vocab THEN token END) AS oov_types
        |FROM marked GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val toks = T.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(256)
        .select(col("token"), lit(true).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .select(col("lang"), col("token"),
          coalesce(col("in_vocab"), lit(false)).as("in_vocab"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          expr("count(CASE WHEN in_vocab THEN 1 END) * 1000000 div count(*)")
            .as("coverage_ppm"),
          countDistinct(when(!col("in_vocab"), col("token"))).as("oov_types"))
        .orderBy(col("lang"))
    },

    // Dedup SURVIVORSHIP (the MDM "golden record" step a dedup pipeline
    // needs after detection): per near-dup cluster (the dd_cluster
    // connected components), elect the member with the highest composite
    // quality score — ties to the lowest doc_id — and record the merged
    // member head. max_by on the (quality, -doc_id) struct keeps the
    // election inside the partial aggregate (no per-cluster window sort),
    // and the member list is BoundedTopK-capped at 20 like the inverted
    // index's postings, so a pathological corpus-sized cluster never
    // materializes a corpus-sized array. Quality is the ONE shared
    // qualityScore definition — survivor choice can never drift from the
    // curation operators' notion of quality.
    Q(
      "tx_survivorship",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |qd AS (SELECT doc_id, ${qualityScoreSql("l")} AS quality
         |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)),
         |m AS (SELECT l.cluster_id, l.doc_id, q.quality FROM lab l JOIN qd q USING (doc_id)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY quality DESC, doc_id) AS rn FROM m)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
         |  max(CASE WHEN rn = 1 THEN quality END) AS survivor_quality,
         |  count(*) AS n_members,
         |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS members
         |FROM r GROUP BY cluster_id ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val labels = clusterLabels(s, d)
      val qd = T.documents(s, d).withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), qualityScore("l").as("quality"))
      val head20 = udaf(graft.functions.BoundedTopK[Long](20))
      labels.select(col("doc_id"), col("label").as("cluster_id"))
        .join(qd, Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(
          max_by(struct(col("doc_id"), col("quality")),
            struct(col("quality"), -col("doc_id"))).as("surv"),
          count(lit(1)).as("n_members"),
          head20(col("doc_id"), col("doc_id")).as("top"))
        .select(col("cluster_id"), col("surv.doc_id").as("survivor_id"),
          col("surv.quality").as("survivor_quality"), col("n_members"),
          array_join(transform(col("top"), t => t.getField("_1").cast("string")), ",")
            .as("members"))
        .orderBy(col("cluster_id"))
    },

    // N-gram NOVELTY scoring — the dedup diagnostic that grades each doc
    // by how much of it is first-seen: for every distinct 4-gram, the
    // MIN doc_id claims it; a doc's novelty is the fraction of its grams
    // it claims. One gram-keyed shuffle builds ownership, and the join
    // back rides the same key (exchange reuse); novelty = one exact
    // integer division per doc. Corpus-order semantics (doc_id = arrival
    // order) make this the batch mirror of the streaming gates' "is this
    // new?" question, scored instead of gated.
    Q(
      "tx_ngram_novelty",
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(${QualityOps.gramsSql(4)})) AS gram FROM d),
         |own AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
         |SELECT g.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN o.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN o.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS novelty
         |FROM g JOIN own o USING (gram)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val g = T.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"),
          explode(array_distinct(expr(QualityOps.gramsSpark(4)))).as("gram"))
      val own = g.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
      g.join(own, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          (col("n_novel").cast(DoubleType) / col("n_grams")).as("novelty"))
        .orderBy(col("doc_id"))
    },

    // END-TO-END CURATION FUNNEL — the capstone report composing the
    // pipeline's own operators into one lineage: raw corpus → per-source
    // cap (the tx_source_cap hash race) → exact dedup (first doc per
    // normalized fingerprint among survivors) → near-dup survivorship
    // (quality-max election within each winnow cluster, re-elected among
    // the docs still standing) → decontamination (the dd_decontaminate
    // bench-shingle criterion, bench slice itself dropped) → quality gate
    // (the ONE shared qualityScore ≥ 0.70). Every stage reuses the exact
    // definition its standalone operator oracles — the funnel can never
    // drift from the operators it summarizes. Spark shape: each stage is
    // a semi-join against the previous stage's id set; the six counts are
    // 1-row aggregates unioned into the report.
    Q(
      "tx_pipeline_funnel",
      s"""WITH RECURSIVE $WinnowPairsCte,
         |p2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE n_shared >= 2),
         |edges AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
         |nodes AS (SELECT DISTINCT a AS d FROM edges),
         |reach(src, dst) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |qd AS (SELECT doc_id, ${qualityScoreSql("l")} AS q
         |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)),
         |s2 AS (SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (PARTITION BY source
         |    ORDER BY CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT),
         |             doc_id) AS rn
         |  FROM documents) WHERE rn <= 10),
         |fps2 AS (SELECT d.doc_id, md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents d JOIN s2 USING (doc_id)),
         |s3 AS (SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM fps2) WHERE rn = 1),
         |lq AS (SELECT l.doc_id, l.cluster_id, q.q
         |  FROM lab l JOIN qd q USING (doc_id) JOIN s3 USING (doc_id)),
         |keep4 AS (SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY q DESC, doc_id) AS rn FROM lq) WHERE rn = 1),
         |s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM lab)
         |  UNION ALL SELECT doc_id FROM keep4),
         |dh AS (SELECT doc_id, ${QualityOps.sid60Sql("g")} AS h FROM (
         |  SELECT doc_id, unnest(list_distinct(${QualityOps.gramsSql(QualityOps.DcN)})) AS g
         |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))),
         |benchh AS (SELECT h FROM dh WHERE doc_id % ${QualityOps.DcBenchMod} = 0),
         |contam AS (SELECT DISTINCT doc_id FROM dh
         |  WHERE doc_id % ${QualityOps.DcBenchMod} <> 0 AND h IN (SELECT h FROM benchh)),
         |s5 AS (SELECT doc_id FROM s4 WHERE doc_id % ${QualityOps.DcBenchMod} <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |s6 AS (SELECT s5.doc_id FROM s5 JOIN qd USING (doc_id) WHERE q >= 0.70)
         |SELECT * FROM (
         |  SELECT 1 AS stage, 'raw' AS name, (SELECT count(*) FROM documents) AS n_docs
         |  UNION ALL SELECT 2, 'source_cap', (SELECT count(*) FROM s2)
         |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM s3)
         |  UNION ALL SELECT 4, 'neardup_survivors', (SELECT count(*) FROM s4)
         |  UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM s5)
         |  UNION ALL SELECT 6, 'quality_gate', (SELECT count(*) FROM s6))
         |ORDER BY stage""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d)
      val labels = clusterLabels(s, d)
      val qd = docs.withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), qualityScore("l").as("q"))
      val cap10 = udaf(graft.functions.BoundedTopK[Long](10))
      val s2 = docs
        .select(col("source"), col("doc_id"),
          QualityOps.sid60(col("doc_id").cast(StringType)).as("h"))
        .groupBy(col("source")).agg(cap10(col("h"), col("doc_id")).as("top"))
        .select(explode(transform(col("top"), t => t.getField("_2"))).as("doc_id"))
        .persist()
      val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val s3 = docs.join(s2, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), md5(norm(col("text"))).as("fp"))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1).select(col("doc_id")).persist()
      val wCl = Window.partitionBy(col("cluster_id"))
        .orderBy(col("q").desc, col("doc_id"))
      val keep4 = labels.select(col("doc_id"), col("label").as("cluster_id"))
        .join(qd, Seq("doc_id")).join(s3, Seq("doc_id"), "left_semi")
        .withColumn("rn", row_number().over(wCl))
        .filter(col("rn") === 1).select(col("doc_id"))
      val s4 = s3.join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionAll(keep4).persist()
      val dh = docs.withColumn("l", split(col("text"), " "))
        .select(col("doc_id"),
          explode(array_distinct(expr(QualityOps.gramsSpark(QualityOps.DcN)))).as("g"))
        .select(col("doc_id"), QualityOps.sid60(col("g")).as("h"))
      val benchh = dh.filter(col("doc_id") % QualityOps.DcBenchMod === 0)
        .select(col("h")).distinct()
      val contam = dh.filter(col("doc_id") % QualityOps.DcBenchMod =!= 0)
        .join(broadcast(benchh), Seq("h")).select(col("doc_id")).distinct()
      val s5 = s4.filter(col("doc_id") % QualityOps.DcBenchMod =!= 0)
        .join(contam, Seq("doc_id"), "left_anti").persist()
      val s6 = s5.join(qd.filter(col("q") >= 0.70), Seq("doc_id"), "left_semi")
      def stageRow(n: Int, name: String, frame: DataFrame) =
        frame.agg(count(lit(1)).as("n_docs"))
          .select(lit(n).as("stage"), lit(name).as("name"), col("n_docs"))
      // the funnel report is 6 rows — materialize it eagerly and release
      // the five stage caches (they'd otherwise sit in executor memory for
      // the rest of a 200-query registry run)
      val out = stageRow(1, "raw", docs)
        .unionAll(stageRow(2, "source_cap", s2))
        .unionAll(stageRow(3, "exact_dedup", s3))
        .unionAll(stageRow(4, "neardup_survivors", s4))
        .unionAll(stageRow(5, "decontaminated", s5))
        .unionAll(stageRow(6, "quality_gate", s6))
        .orderBy(col("stage"))
        .localCheckpoint(eager = true)
      Seq(s2, s3, s4, s5).foreach(_.unpersist())
      out
    }
  )
}
