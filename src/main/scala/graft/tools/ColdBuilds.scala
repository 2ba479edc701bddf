package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{QualityOps, ScaleOps, TextOps, VectorOps}

/** The registry of one-time memoized artifact builds — everything a
  * production pipeline would persist once per corpus snapshot and that the
  * engine memoizes per (session, dataset): quantized vector indexes, PQ
  * codebooks, IVF cells, MinHash/embedding incremental-split indexes,
  * winnow pairs, near-dup cluster labels, the trained quality classifier,
  * and the bucketed at-rest layout.
  *
  * Why this exists: the bench's min-of-3 protocol plus memoization means a
  * consumer query's timed runs NEVER pay these builds — `tx_classifier_train`
  * reports ~0.04 s because training happened once during warmup. At 100 TB
  * these builds ARE the pipeline, so the bench times them separately
  * (Bench's cold pass) and reports cold and warm numbers side by side.
  *
  * Entries are in DEPENDENCY ORDER (pq/ivf read the quantized corpus,
  * cluster labels read winnow pairs): timing each build with its upstreams
  * already built attributes each artifact its own incremental cost, and
  * the sum is the true cold total.
  */
object ColdBuilds {
  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "vec_quantized" ->
      ((s: SparkSession, d: String) => { VectorOps.quantized(s, d, withBucket = false); () }),
    "vec_quantized_bucketed" ->
      ((s: SparkSession, d: String) => { VectorOps.quantized(s, d, withBucket = true); () }),
    "vec_embed_split_index" ->
      ((s: SparkSession, d: String) => { VectorOps.embedIncrementalSplit(s, d); () }),
    "vec_pq_index" ->
      ((s: SparkSession, d: String) => VectorOps.buildPqIndex(s, d)),
    "vec_ivf_cells" ->
      ((s: SparkSession, d: String) => VectorOps.buildIvfCells(s, d)),
    "vec_knn_graph" ->
      ((s: SparkSession, d: String) => VectorOps.buildKnnGraph(s, d)),
    // the walk's serving index (round 15): symmetrized adjacency with the
    // neighbor payloads attached — built FROM vec_knn_graph, so it sits
    // right after it in dependency order
    "vec_graph_adjacency" ->
      ((s: SparkSession, d: String) => VectorOps.buildGraphAdjacency(s, d)),
    "text_minhash_split_index" ->
      ((s: SparkSession, d: String) => { TextOps.incrementalSplit(s, d); () }),
    "text_simhash_signatures" ->
      ((s: SparkSession, d: String) => TextOps.buildSimhashSignatures(s, d)),
    "text_winnow_pairs" ->
      ((s: SparkSession, d: String) => TextOps.buildWinnowPairs(s, d)),
    "text_bm25_postings" ->
      ((s: SparkSession, d: String) => TextOps.buildBm25Postings(s, d)),
    "image_phash_corpus" ->
      ((s: SparkSession, d: String) => { graft.operators.ImageDup.hashedCorpus(s, d); () }),
    // the CC label artifacts split base/incremental since round 13: the
    // *_base rows are the weekly-compaction cost (full CC over the prior
    // snapshot's pairs, amortized across batches in production); the main
    // rows then time ONLY the incremental mergeLabels fold of the admitted
    // batch's pairs — the true per-batch cost at 100 TB.
    "text_cluster_labels_base" ->
      ((s: SparkSession, d: String) => TextOps.buildClusterLabelsBase(s, d)),
    "text_cluster_labels" ->
      ((s: SparkSession, d: String) => TextOps.buildClusterLabels(s, d)),
    // the semantic pair graph splits base/incremental like the CC labels
    // (round 14): vec_semantic_pairs_base is the weekly-compaction cost
    // (full within-label join over the prior snapshot); the main row then
    // times ONLY the probe-fed batch delta — the true per-batch cost.
    "vec_semantic_pairs_base" ->
      ((s: SparkSession, d: String) => VectorOps.buildSemanticPairsBase(s, d)),
    "vec_semantic_pairs" ->
      ((s: SparkSession, d: String) => VectorOps.buildSemanticPairs(s, d)),
    "ensemble_labels_base" ->
      ((s: SparkSession, d: String) => TextOps.buildEnsembleLabelsBase(s, d)),
    "ensemble_cluster_labels" ->
      ((s: SparkSession, d: String) => TextOps.buildEnsembleLabels(s, d)),
    // classifier training splits base/warm-start like the CC labels and
    // the semantic pairs (round 14): classifier_state_base is the
    // from-zero 12-epoch train over the prior snapshot (weekly role); the
    // main row then times ONLY the 4-epoch warm-start continuation over
    // the full corpus — the true per-batch retrain cost.
    "classifier_state_base" ->
      ((s: SparkSession, d: String) => QualityOps.buildClassifierBase(s, d)),
    "classifier_state" ->
      ((s: SparkSession, d: String) => QualityOps.buildClassifierState(s, d)),
    "bucketed_tables" ->
      ((s: SparkSession, d: String) => ScaleOps.buildBucketedTables(s, d)))
}
