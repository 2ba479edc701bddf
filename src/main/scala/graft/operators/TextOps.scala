package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Q, Tables => T}

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
  *    keys, Jaccard shuffles on document-frequency-capped shingles. Each
  *    bounds the join fan-out by construction (band width / df cap), the
  *    standard web-scale dedup shape;
  *  - SimHash all-pairs verify is the one quadratic stage; at scale it is
  *    bucketed by signature prefix (see dd_simhash scaladoc).
  *
  * Determinism for the DuckDB oracle: token ids come from a dictionary
  * (dense rank over distinct tokens) instead of xxhash64 so both engines
  * produce identical hashes; at 100 TB the dictionary join is replaced by
  * xxhash64(token) — same plan shape, no global sort (noted per query).
  */
object TextOps {

  private val Stop = Seq("the", "a", "of", "to", "and", "in", "is")
  private def stopList: String = Stop.map(s => s"'$s'").mkString("array(", ",", ")")
  private def stopListSql: String = Stop.map(s => s"'$s'").mkString("[", ",", "]")

  /** normalized text: lower, trim, collapse whitespace — the canonical form
    * every fingerprint/dedup query keys on. */
  private def norm(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

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

    // Quality scoring: stopword ratio, type-token ratio, mean token length,
    // composite score. Identical IEEE double expression tree on both engines
    // → exact compare. One narrow map, codegen'd (higher-order functions).
    Q(
      "tx_quality",
      s"""SELECT doc_id, n_tokens,
         |  stop_ratio, uniq_ratio, mean_tok_len,
         |  0.4*uniq_ratio + 0.4*(1.0-stop_ratio) + 0.2*least(CAST(n_tokens AS DOUBLE)/100.0, 1.0) AS quality
         |FROM (
         |  SELECT doc_id,
         |    len(l) AS n_tokens,
         |    CAST(len(list_filter(l, t -> list_contains($stopListSql, t))) AS DOUBLE)/len(l) AS stop_ratio,
         |    CAST(len(list_distinct(l)) AS DOUBLE)/len(l) AS uniq_ratio,
         |    CAST(length(text)-(len(l)-1) AS DOUBLE)/len(l) AS mean_tok_len
         |  FROM (SELECT doc_id, text, string_split(text,' ') AS l FROM documents))
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
            .as("mean_tok_len"))
        .withColumn("quality",
          lit(0.4) * col("uniq_ratio") + lit(0.4) * (lit(1.0) - col("stop_ratio"))
            + lit(0.2) * least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)))
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

    // ── Deduplication ─────────────────────────────────────────────────────

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
        .select(col("doc_id"), explode(array_distinct(
          when(size(col("l")) >= 3,
            expr("transform(sequence(1, size(l)-2), i -> concat_ws(' ', slice(l, i, 3)))"))
            .otherwise(expr("cast(array() as array<string>)")))).as("shingle"))
      val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select(col("shingle"))
      val shr = sh.join(rare, Seq("shingle"))
      val cnt = shr.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = shr.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = shr.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
      val pairs = a.join(b, col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
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

    // MinHash + banded LSH: K=16 arithmetic permutations h_k(id)=(a_k·id+b_k)
    // mod P over dictionary token ids, 4 bands × 4 rows; candidates collide
    // on a whole band; estimated Jaccard = matching-minhash fraction.
    // Scale path: token_id dictionary (global rank, oracle-deterministic)
    // becomes xxhash64(token) at 100 TB — same plan minus the dictionary
    // join; band-key shuffle bounds candidate fan-out by construction.
    Q(
      "dd_minhash_lsh",
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)),
        |dict AS (SELECT token, ROW_NUMBER() OVER (ORDER BY token) AS token_id
        |         FROM (SELECT DISTINCT token FROM toks)),
        |ht AS (SELECT t.doc_id, k.k,
        |         (d.token_id*(k.k*31+7) + (k.k*17+3)) % 1000003 AS h
        |       FROM toks t JOIN dict d USING (token), range(0,16) k(k)),
        |sig AS (SELECT doc_id, k, min(h) AS mh FROM ht GROUP BY doc_id, k),
        |bands AS (SELECT doc_id, k//4 AS band,
        |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY k) AS band_key
        |          FROM sig GROUP BY doc_id, k//4),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
        |SELECT c.doc_a, c.doc_b,
        |  sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)/16.0 AS est_jaccard
        |FROM cand c
        |JOIN sig sa ON sa.doc_id = c.doc_a
        |JOIN sig sb ON sb.doc_id = c.doc_b AND sa.k = sb.k
        |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val toks = T.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("token"))
      val dict = toks.select(col("token")).distinct()
        .withColumn("token_id", row_number().over(Window.orderBy(col("token"))))
      val ht = toks.join(broadcast(dict), Seq("token"))
        .select(col("doc_id"), explode(expr("sequence(0, 15)")).as("k"), col("token_id"))
        .withColumn("h", (col("token_id") * (col("k") * 31 + 7) + (col("k") * 17 + 3)) % 1000003)
      val sig = ht.groupBy(col("doc_id"), col("k")).agg(min(col("h")).as("mh"))
      val bands = sig.groupBy(col("doc_id"), (col("k") / 4).cast(IntegerType).as("band"))
        .agg(expr("array_join(transform(array_sort(collect_list(struct(k, mh))), x -> cast(x.mh as string)), ',')")
          .as("band_key"))
      val ba = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      val bb = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
      val cand = ba.join(bb, Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val sa = sig.select(col("doc_id").as("doc_a"), col("k"), col("mh").as("mha"))
      val sb = sig.select(col("doc_id").as("doc_b"), col("k"), col("mh").as("mhb"))
      cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b", "k"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg((sum(when(col("mha") === col("mhb"), 1).otherwise(0)) / 16.0).as("est_jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }.copy(bench = true),

    // SimHash near-dup: 32-bit signature from frequency-weighted token-hash
    // bits; near-dup when hamming distance <= 6. The pairwise verify here is
    // all-pairs (fine at test SF); at 100 TB candidates come from grouping
    // on 4 rotated 8-bit signature prefixes (pigeonhole: hamming<=6 over 32
    // bits guarantees one exact-matching byte), bounding the join.
    Q(
      "dd_simhash",
      """WITH tw AS (
        |  SELECT doc_id, token, count(*) AS w FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)
        |  GROUP BY doc_id, token),
        |dict AS (SELECT token, ROW_NUMBER() OVER (ORDER BY token) AS token_id
        |         FROM (SELECT DISTINCT token FROM tw)),
        |th AS (SELECT tw.doc_id, tw.w,
        |         (1103515245*d.token_id + 12345) % 4294967296 AS h
        |       FROM tw JOIN dict d USING (token)),
        |bits AS (SELECT doc_id, j.j,
        |           sum(CASE WHEN (h // CAST(pow(2, j.j) AS BIGINT)) % 2 = 1 THEN w ELSE -w END) AS s
        |         FROM th, range(0,32) j(j) GROUP BY doc_id, j.j),
        |sh AS (SELECT doc_id,
        |         sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS simhash
        |       FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.simhash, b.simhash)) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val tw = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("w"))
      val dict = tw.select(col("token")).distinct()
        .withColumn("token_id", row_number().over(Window.orderBy(col("token"))))
      val th = tw.join(broadcast(dict), Seq("token"))
        .withColumn("h", (lit(1103515245L) * col("token_id") + 12345L) % 4294967296L)
      val bits = th
        .select(col("doc_id"), col("w"), col("h"), explode(expr("sequence(0, 31)")).as("j"))
        .withColumn("pw", expr("cast(pow(2, j) as bigint)"))
        .groupBy(col("doc_id"), col("j"), col("pw"))
        .agg(sum(when(expr("(h div pw) % 2") === 1, col("w"))
          .otherwise(-col("w"))).as("s"))
      val sh = bits.groupBy(col("doc_id"))
        .agg(sum(when(col("s") > 0, col("pw")).otherwise(0L)).as("simhash"))
      val a = sh.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast(LongType))
        .filter(col("hamming") <= 6)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
