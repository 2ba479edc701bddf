package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The production incremental near-dup flow as TWO jobs against a
  * PERSISTED index: job 1 builds the MinHash signature + band tables and
  * writes them to parquet; job 2 (a later session) reloads the index and
  * probes it with a new batch. Verdicts must equal the one-shot
  * `dd_incremental_lsh` computation on the same split — proving the
  * parquet round trip loses nothing and the corpus is never re-read. */
class NearDupIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("parquet-persisted index probe equals the one-shot computation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cut = docs.agg(expr("(max(doc_id)*9) div 10")).collect()(0).getLong(0)
    val corpus = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)

    // job 1: build + persist the index
    val dir = Files.createTempDirectory("graft-ndidx").toString
    val sigBuilt = TextOps.minhashSignatures(corpus).persist()
    sigBuilt.write.parquet(s"$dir/sig")
    TextOps.bandTable(sigBuilt).write.parquet(s"$dir/bands")
    sigBuilt.unpersist()

    // job 2: reload the index, sign ONLY the batch, probe
    val sigIdx = spark.read.parquet(s"$dir/sig")
    val bandsIdx = spark.read.parquet(s"$dir/bands")
    val newSig = TextOps.minhashSignatures(batch).persist()
    val fromIndex = TextOps.probeNearDupIndex(newSig, sigIdx, bandsIdx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

    // one-shot computation over the same split
    val oneShot = TextOps.probeNearDupIndex(
        newSig, TextOps.minhashSignatures(corpus),
        TextOps.bandTable(TextOps.minhashSignatures(corpus)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

    assert(fromIndex.nonEmpty, "batch must produce verdicts")
    assert(fromIndex.toSeq === oneShot.toSeq)
    // the split covers every batch document exactly once
    assert(fromIndex.map(_._1).distinct.length === fromIndex.length)
    assert(fromIndex.length === batch.count())
  }

  test("bucketed band index: shuffle probe equals broadcast probe, corpus exchange-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cut = docs.agg(expr("(max(doc_id)*9) div 10")).collect()(0).getLong(0)
    val corpusSig = TextOps.minhashSignatures(docs.filter(col("doc_id") < cut)).persist()
    val newSig = TextOps.minhashSignatures(docs.filter(col("doc_id") >= cut)).persist()

    // job 1: persist the signature-carrying band index BUCKETED by bkey
    val dir = Files.createTempDirectory("graft-ndbkt").toString
    spark.sql("DROP TABLE IF EXISTS graft_test_bandidx")
    TextOps.writeBandIndex(corpusSig, "graft_test_bandidx", s"$dir/bandidx",
      nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt)

    // job 2: large-batch shuffle probe over the bucketed table
    val probe = TextOps.probeNearDupIndexShuffle(newSig, spark.table("graft_test_bandidx"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val big = probe.collect().map(key).sortBy(_._1)
    val small = TextOps.probeNearDupIndex(
        newSig, corpusSig, TextOps.bandTable(corpusSig))
      .collect().map(key).sortBy(_._1)
    assert(big.nonEmpty && big.toSeq === small.toSeq,
      "shuffle-path verdicts must equal the broadcast-path verdicts")

    // the 100 TB property: NO shuffle sits above the bucketed corpus scan —
    // only the new batch is exchanged to meet the corpus in its buckets
    val corpusShuffles = probe.queryExecution.sparkPlan.collect {
      case ex: ShuffleExchangeExec if ex.collectLeaves().exists {
            case s: FileSourceScanExec =>
              s.relation.location.rootPaths.exists(_.toString.contains("bandidx"))
            case _ => false
          } => ex
    }
    assert(corpusShuffles.isEmpty,
      s"bucketed corpus side got exchanged: ${corpusShuffles.mkString("; ")}")
    corpusSig.unpersist(); newSig.unpersist()
  }
}
