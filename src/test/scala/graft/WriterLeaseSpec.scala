package graft

import java.nio.file.{Files, Paths => JPaths, Files => JFiles}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Single-writer lease on streaming state roots (round-11 hardening): the
  * `_staging-*` reap in `upsertBatch` is only safe under exactly one
  * writer per root. Previously that was an unenforced assumption — true
  * under one checkpointed foreachBatch, but nothing stopped an operator
  * pointing a second stream (or a batch backfill) at a live stream's state
  * dir, where the second writer's entry reap would delete the first's live
  * staging mid-batch. The lease (`_graft_writer` marker, claimed
  * create-exclusive on first write) turns that into a loud error; handover
  * is explicit via `releaseLease`, never inferred from timestamps — so
  * there is no TTL window where two live writers both believe they own the
  * root, and crash-replay under the SAME durable identity (the checkpoint
  * dir, for streams) passes untouched (kill-sim specs unchanged).
  */
class WriterLeaseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-lease").toString + "/state"

  test("a second writer fails loudly and the owner's live staging survives") {
    val dir = freshRoot()
    Pipelines.upsertBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      writer = "ckpt:/tmp/stream-a")
    // simulate writer A mid-batch: a live staging dir on the root
    val staging = JPaths.get(dir, "_staging-live01")
    JFiles.createDirectories(staging)
    JFiles.write(staging.resolve("part-0.parquet"), Array[Byte](1, 2, 3))

    val ex = intercept[IllegalStateException] {
      Pipelines.upsertBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"), Seq("k"),
        writer = "ckpt:/tmp/stream-b")
    }
    assert(ex.getMessage.contains("owned by writer 'ckpt:/tmp/stream-a'"))
    assert(ex.getMessage.contains("releaseLease"))
    assert(JFiles.exists(staging.resolve("part-0.parquet")),
      "the intruding writer must fail BEFORE reaping the owner's staging")
    // and the state is untouched by the failed writer
    val st = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "a"))
  }

  test("the same writer re-enters freely (per-batch path and crash-replay)") {
    val dir = freshRoot()
    val w = "ckpt:/tmp/stream-a"
    Pipelines.upsertBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      writer = w)
    // leftover staging from a kill of THIS writer is reaped, not fatal —
    // staging dirs are namespaced by the writer's token tag (round 12),
    // so the reap matches exactly the dirs this writer could have left
    val staging = JPaths.get(dir, s"_staging-${Pipelines.writerTag(w)}-dead01")
    JFiles.createDirectories(staging)
    // a SIBLING task's tag (e.g. a co-owning drain under a different
    // token in another process — or pre-handover litter) is NOT matched
    // by the steady-state reap: only a fresh lease claim may touch it
    val foreign = JPaths.get(dir, "_staging-ffffffff-live")
    JFiles.createDirectories(foreign)
    Pipelines.upsertBatch(spark, dir, Seq((1L, "a2"), (2L, "b")).toDF("k", "v"),
      Seq("k"), writer = w)
    assert(!JFiles.exists(staging), "own leftovers are reaped on re-entry")
    assert(JFiles.exists(foreign),
      "another tag's staging dir must survive a steady-state reap")
    val st = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "a2", 2L -> "b"))
  }

  test("explicit releaseLease hands the root to a new writer") {
    val dir = freshRoot()
    Pipelines.upsertBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      writer = "ckpt:/tmp/old-pipeline")
    intercept[IllegalStateException] {
      Pipelines.upsertBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"), Seq("k"),
        writer = "backfill-2026-08")
    }
    Pipelines.releaseLease(spark, dir)
    // the decommissioned writer's crash litter (its OWN tag) is reclaimed
    // by the new owner's CLAIM — the one moment no live writer can exist —
    // while steady-state reaps never cross tags
    val orphan = JPaths.get(dir,
      s"_staging-${Pipelines.writerTag("ckpt:/tmp/old-pipeline")}-orphan")
    JFiles.createDirectories(orphan)
    Pipelines.upsertBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"), Seq("k"),
      writer = "backfill-2026-08")
    assert(!JFiles.exists(orphan),
      "a lease claim reclaims decommissioned writers' staging orphans")
    val st = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "a", 2L -> "b"),
      "handover changes ownership, not contents")
    // and the new owner now holds the lease against the old identity
    intercept[IllegalStateException] {
      Pipelines.upsertBatch(spark, dir, Seq((3L, "c")).toDF("k", "v"), Seq("k"),
        writer = "ckpt:/tmp/old-pipeline")
    }
  }

  test("adhoc default callers share one token (existing batch specs unchanged)") {
    val dir = freshRoot()
    Pipelines.upsertBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    Pipelines.upsertBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    val st = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "a", 2L -> "b"))
  }
}
