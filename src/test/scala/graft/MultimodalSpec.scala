package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry
import graft.operators.Multimodal

/** Multimodal plumbing: the stubbed decode must be deterministic, the
  * mapPartitions feature stage must preserve batch shape (one output row
  * per input, work distributed across input partitions), and resize
  * planning must respect its box invariants.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("md5Features is deterministic and 4-wide") {
    val a = Multimodal.md5Features("hello".getBytes("UTF-8"))
    val b = Multimodal.md5Features("hello".getBytes("UTF-8"))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 4)
    assert(a.forall(v => v >= 0 && v <= 0xffffL))
  }

  test("feature extraction emits exactly one row per document") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val feats = QueryRegistry.byName("mm_feature_extract").fn(spark, sf)
    assert(feats.count() === docs)
    // features is rendered as a canonical comma-joined string; still 4-wide
    assert(feats.select(size(split(col("features"), ","))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(4))
  }

  test("resize plan fits the 64-box and never collapses a dimension") {
    val plan = QueryRegistry.byName("mm_resize_plan").fn(spark, sf).collect()
    plan.foreach { r =>
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(ow >= 1 && ow <= 64, s"out_w $ow")
      assert(oh >= 1 && oh <= 64, s"out_h $oh")
      // the longer input side maps to the longer (or equal) output side
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      assert((w >= h) === (ow >= oh) || ow == oh)
    }
  }

  test("frame sampling strides by 10 from frame 0") {
    val frames = QueryRegistry.byName("mm_frame_sample").fn(spark, sf)
      .select(col("frame_idx")).distinct().collect().map(_.getLong(0))
    assert(frames.forall(_ % 10 === 0))
  }
}
