package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

import graft.plans.PhashExpr

/** Reusable perceptual-hash IMAGE dedup index/probe API — the image mirror
  * of TextOps' minhash index (probeNearDupIndex) and VectorOps' embedding
  * index (probeEmbedIndex), consumed by the `dd_incremental_phash` batch
  * query and the streaming `Pipelines.imageDupGate`.
  *
  * Index layout: ONE row per image `(img_id, ph)` — the 63-bit DCT-sign
  * perceptual hash (graft.plans.Phash). Like the text signature table, the
  * persisted index carries NO band columns: the 4×16-bit pigeonhole bands
  * are derived row-locally at probe time ([[bandTable]]), so each batch
  * writes one slim row per image and the banding can be retuned without
  * rewriting the corpus.
  *
  * Probe shape (the scale contract): the corpus index streams through the
  * band join UNSHUFFLED — the batch's band table broadcasts — candidates
  * are images sharing ANY band (complete for hamming ≤ 3 by pigeonhole),
  * multi-band collisions are kept exactly once by the row-local
  * FIRST-band-match filter (both sides carry their 4 raw bands in-row, so
  * no dedup shuffle exists anywhere), and the exact `bit_count(xor)`
  * hamming verifies in-line. Everything after the band join is
  * candidate-sized.
  */
object ImageDup {

  /** verdict threshold: near-dup iff hamming ≤ 3 — the bound the 4-band
    * pigeonhole is complete for (3 flips cannot touch all 4 bands). */
  val MaxHamming = 3L

  /** hamming sentinel for probes with zero candidates (> any real value). */
  val NoCandidate = 64L

  /** `(img_id, ph)` index rows for an arbitrary `(img_id, media)` frame:
    * one codegen'd phash16 per payload, unparseable payloads dropped
    * (null hash — a quarantine path would tee them; the dedup index only
    * ever holds decodable images). Narrow map, no shuffle. */
  def imageIndex(df: DataFrame): DataFrame =
    df.select(col("img_id"), toCol(PhashExpr(toExpr(col("media")))).as("ph"))
      .filter(col("ph").isNotNull)

  /** the 4 pigeonhole bands of a hash, in-row: band t = bits 16t..16t+15
    * (band 3 carries 15 bits — the hash is 63-bit non-negative). */
  private def bandArr(ph: String): Column =
    expr(s"transform(sequence(0, 3), t -> shiftright($ph, 16*t) % 65536)")

  /** banded view of an [[imageIndex]] frame: 4 rows per image,
    * `(img_id, ph, bands, t, band)`. Row-local explode; no shuffle. */
  private def bandTable(idx: DataFrame): DataFrame =
    idx.withColumn("bands", bandArr("ph"))
      .select(col("img_id"), col("ph"), col("bands"),
        posexplode(col("bands")).as(Seq("t", "band")))

  /** row-local exactly-once filter over a band-collision pair: keep the
    * row whose `t` is the FIRST band index where the two sides agree
    * (VectorOps.firstTableMatch's shape — a pair colliding in several
    * bands joins several times; this keeps one with no dedup shuffle). */
  private def firstBandMatch(a: String, b: String): Column = {
    def eqAt(u: Int): Column =
      expr(s"element_at($a, ${u + 1})") === expr(s"element_at($b, ${u + 1})")
    (0 until 4).map { t =>
      (0 until t).map(u => !eqAt(u)).foldLeft(col("t") === t && eqAt(t))(_ && _)
    }.reduce(_ || _)
  }

  /** probe a persisted image index with a new batch → one verdict row per
    * new image: `(img_id, n_cand, best_hamming, is_dup)`. Silent images
    * (no band collision) verdict as (0, [[NoCandidate]], false). */
  def probeImageIndex(newIdx: DataFrame, corpusIdx: DataFrame,
      maxHamming: Long = MaxHamming): DataFrame = {
    require(maxHamming <= MaxHamming,
      s"4-band pigeonhole is complete only for hamming <= $MaxHamming; got $maxHamming")
    val nb = bandTable(newIdx).select(col("img_id").as("new_id"),
      col("ph").as("nph"), col("bands").as("nbands"), col("t"), col("band"))
    val scored = bandTable(corpusIdx)
      .select(col("img_id").as("corpus_id"), col("ph").as("cph"),
        col("bands"), col("t"), col("band"))
      .join(broadcast(nb), Seq("t", "band"))
      .filter(firstBandMatch("nbands", "bands"))
      .select(col("new_id"),
        bit_count(col("nph").bitwiseXOR(col("cph"))).cast(LongType).as("hamming"))
    val per = scored.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_cand"), min(col("hamming")).as("best_hamming"))
    newIdx.select(col("img_id"))
      .join(broadcast(per.withColumnRenamed("new_id", "img_id")), Seq("img_id"), "left")
      .select(col("img_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("best_hamming"), lit(NoCandidate)).as("best_hamming"))
      .withColumn("is_dup", col("best_hamming") <= maxHamming)
  }

  /** memoized corpus hash table `(img_id, ph)` over the documents
    * fixture corpus — the serving tier's image index (built once per
    * (session, dataset) like the quantized vector index; the fixture
    * generation stands in for reading an image store). */
  private val hashCache = new graft.core.SessionCache[org.apache.spark.sql.DataFrame]()
  private[graft] def hashedCorpus(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    hashCache.get(s, d) {
      import s.implicits._
      imageIndex(
        graft.core.Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(id =>
            (id, graft.plans.Phash.bmpPixelFixture(id))))
          .toDF("img_id", "media"))
        .localCheckpoint(eager = true)
    }

  /** top-k perceptual neighbors of ONE corpus image — the program behind
    * the serving tier's /images/similar route: the query image's 4 bands
    * probe the memoized hash corpus (broadcast single-row band table,
    * corpus unshuffled), exact hamming, global BoundedTopK — the collect
    * downstream is bounded at k rows. Unknown img_id returns empty. */
  def similarFor(s: org.apache.spark.sql.SparkSession, d: String,
      imgId: Long, k: Int): DataFrame = {
    val corpus = hashedCorpus(s, d)
    val q = corpus.filter(col("img_id") === imgId)
      .select(col("ph").as("qph"))
      .withColumn("qbands", bandArr("qph"))
      .select(col("qph"), posexplode(col("qbands")).as(Seq("t", "band")))
    val cand = corpus.withColumn("bands", bandArr("ph"))
      .select(col("img_id").as("n_id"), col("ph"), col("bands"),
        posexplode(col("bands")).as(Seq("t", "band")))
      .join(broadcast(q), Seq("t", "band"))
      .filter(col("n_id") =!= imgId)
      .select(col("n_id"),
        bit_count(col("qph").bitwiseXOR(col("ph"))).cast(LongType).as("hamming"))
      .dropDuplicates(Seq("n_id"))
    val topk = udaf(graft.functions.BoundedTopK[Long](k))
    cand
      .agg(topk(expr(s"hamming * 281474976710656L + n_id"), col("n_id")).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t._2").as("img_id"),
        expr("t._1 div 281474976710656L").as("hamming"),
        (col("r0") + 1).cast(org.apache.spark.sql.types.LongType).as("rnk"))
  }

  /** within-batch first-wins: of any two batch images within `maxHamming`,
    * the LARGER img_id drops (the text/embed gates' intra-batch contract).
    * Band join on the batch itself — batch-sized, not corpus-sized. */
  def intraBatchImageDups(newIdx: DataFrame,
      maxHamming: Long = MaxHamming): DataFrame = {
    require(maxHamming <= MaxHamming,
      s"4-band pigeonhole is complete only for hamming <= $MaxHamming; got $maxHamming")
    val b = bandTable(newIdx)
    b.select(col("img_id").as("img_a"), col("ph").as("pa"),
        col("bands").as("abands"), col("t"), col("band"))
      .join(b.select(col("img_id").as("img_b"), col("ph").as("pb"),
        col("bands").as("bands"), col("t"), col("band")), Seq("t", "band"))
      .filter(col("img_a") < col("img_b"))
      .filter(firstBandMatch("abands", "bands"))
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= maxHamming)
      .select(col("img_b").as("img_id")).distinct()
  }
}
