package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit storage release for ONE-SHOT localCheckpoint artifacts.
  *
  * `Dataset.localCheckpoint` pins the materialized RDD in executor
  * storage for the session lifetime (`Dataset.unpersist` only touches
  * CacheManager entries, never checkpoint blocks). Long-lived artifacts
  * want exactly that; a checkpoint consumed only inside a one-time build
  * (e.g. QualityOps' base-scope training frames) should hand its blocks
  * back once the build returns. A checkpointed frame analyzes to a
  * [[LogicalRDD]] over the pinned RDD — unpersisting that RDD is the
  * release. Non-checkpoint plans are a no-op, so callers can release
  * unconditionally.
  *
  * NOT for frames with later readers: a released checkpoint has no
  * lineage to recompute from — reading it again is an error by design
  * (the same contract as the CC loop's per-round unpersist). */
object Checkpoints {
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
