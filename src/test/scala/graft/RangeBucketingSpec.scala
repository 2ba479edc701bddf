package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines
import graft.streaming.Pipelines.Bucketing

/** Range bucketing for monotonic keys: an append-mostly batch touches only
  * the tail buckets — O(batch) write amplification at any state size —
  * while the generation/swap protocol and readState stay identical to the
  * hash layout. The marker pins the layout: reopening a range state as
  * hash (or with a different span) fails fast.
  */
class RangeBucketingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val bk = Some(Bucketing.range("k", 32L))

  test("rows land in k div span buckets; readState round-trips") {
    val dir = Files.createTempDirectory("graft-range").toString + "/state"
    val b1 = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
    Pipelines.upsertBatch(spark, dir, b1, Seq("k"), bucketing = bk)
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__gbkt="))
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq("__gbkt=0", "__gbkt=1", "__gbkt=2", "__gbkt=3"),
      "100 keys at span 32 occupy exactly buckets 0-3")
    val got = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(got.size === 100 && got(0L) === "v0" && got(99L) === "v99")
  }

  test("an append batch touches only tail buckets; earlier files byte-identical") {
    val dir = Files.createTempDirectory("graft-range2").toString + "/state"
    Pipelines.upsertBatch(spark,
      dir, (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"),
      bucketing = bk)
    def snapshot(): Map[String, String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = java.nio.file.Paths.get(dir)
      val it = java.nio.file.Files.walk(base).iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          md.reset()
          base.relativize(p).toString ->
            md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
        }.toMap
    }
    val before = snapshot()
    // the append-mostly shape: new keys 100-119 land in buckets 3 and 4 only
    Pipelines.upsertBatch(spark,
      dir, (100L until 120L).map(k => (k, s"w$k")).toDF("k", "v"), Seq("k"),
      bucketing = bk)
    val after = snapshot()
    val untouchedBefore = before.filter(p =>
      !p._1.startsWith("__gbkt=3/") && !p._1.startsWith("__gbkt=4/"))
    assert(untouchedBefore.nonEmpty)
    assert(after.filter(p =>
        !p._1.startsWith("__gbkt=3/") && !p._1.startsWith("__gbkt=4/"))
      === untouchedBefore,
      "buckets below the batch's key range must be byte-identical")
    val got = Pipelines.readState(spark, dir).as[(Long, String)].collect().toMap
    assert(got.size === 120 && got(50L) === "v50" && got(119L) === "w119")
  }

  test("replay is idempotent; the marker pins the layout") {
    val dir = Files.createTempDirectory("graft-range3").toString + "/state"
    val b = (0L until 50L).map(k => (k, s"v$k")).toDF("k", "v")
    Pipelines.upsertBatch(spark, dir, b, Seq("k"), bucketing = bk)
    Pipelines.upsertBatch(spark, dir, b, Seq("k"), bucketing = bk) // replay
    assert(Pipelines.readState(spark, dir).count() === 50)

    val exHash = intercept[IllegalStateException] {
      Pipelines.upsertBatch(spark, dir, b, Seq("k")) // default hash layout
    }
    assert(exHash.getMessage.contains("range=k/32"))
    val exSpan = intercept[IllegalStateException] {
      Pipelines.upsertBatch(spark, dir, b, Seq("k"),
        bucketing = Some(Bucketing.range("k", 64L)))
    }
    assert(exSpan.getMessage.contains("asked for range=k/64"))
  }
}
