package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Custom whole-operator plumbing — the last rung of the custom-operator
  * ladder (SURVEY.md §7.3): a logical relation (`BlockRangePlan`) planned
  * into a custom physical operator (`BlockRangeExec`) by a
  * `SparkStrategy` injected through `SparkSessionExtensions`
  * (complementing the Expression, Aggregator, LogicalPlan+Rule, and
  * DataSource V2 rungs).
  *
  * Semantics: the deterministic block-header relation
  * (blockNumber, txCount) over [start, end], generated directly as
  * UnsafeRows across `slices` partitions — the batch-relation twin of the
  * `graft-blocks` streaming source (scan_raw_txs.py forced-range mode)
  * with an oracle-reproducible txCount formula.
  */
case class BlockRangePlan(output: Seq[Attribute], start: Long, end: Long, slices: Int)
    extends LeafNode {
  // output is a constructor field (LocalRelation-style) so plan copies
  // keep the same exprIds — a derived val would regenerate them and
  // orphan parent references.
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(math.max(1L, (end - start + 1) * 16L)))
}

object BlockRangePlan {
  def apply(start: Long, end: Long, slices: Int): BlockRangePlan =
    BlockRangePlan(Seq(
      AttributeReference("blockNumber", LongType, nullable = false)(),
      AttributeReference("txCount", IntegerType, nullable = false)()),
      start, end, slices)
}

object BlockRangeRelation {
  /** oracle-reproducible mix: (block * 2654435761) % 2^31 % 50 — no 64-bit
    * wraparound, so DuckDB BIGINT arithmetic computes the same value. */
  def txCount(block: Long): Int =
    ((block * 2654435761L) % 2147483648L % 50L).toInt

  val TxCountSql: String = "(b * 2654435761) % 2147483648 % 50"
}

case class BlockRangeExec(output: Seq[Attribute], start: Long, end: Long, slices: Int)
    extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    val (lo, hi, k) = (start, end, math.max(1, slices))
    sparkContext.parallelize(0 until k, k).mapPartitions { it =>
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](LongType, IntegerType))
      it.flatMap { i =>
        val n = hi - lo + 1
        val from = lo + n * i / k
        val to = lo + n * (i + 1) / k - 1
        (from to to).iterator.map { b =>
          proj(new GenericInternalRow(Array[Any](b, BlockRangeRelation.txCount(b))))
        }
      }
    }
  }
}

object BlockRangeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BlockRangePlan(out, start, end, slices) =>
      BlockRangeExec(out, start, end, slices) :: Nil
    case _ => Nil
  }
}
