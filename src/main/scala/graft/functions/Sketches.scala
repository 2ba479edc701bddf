package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator sketches — SURVEY.md §2.10 X5 / §7.4: the custom-UDAF
  * path for sketch state that built-in aggregates can't express. The
  * MinHash signature aggregator carries a fixed K-slot buffer, merges by
  * element-wise min (commutative + associative → map-side partial
  * aggregation works), and matches the wide-aggregation formula used by
  * the `dd_minhash_lsh` query bit for bit: h_k(x) = (x·(31k+7) + (17k+3))
  * mod P over pre-hashed 60-bit ids reduced mod P.
  *
  * Scale: the buffer is K longs regardless of group size — constant-space
  * per key, spill-free, and the merge is O(K): exactly the shape a 100 TB
  * signature build needs.
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  val K = 16
  val P = 1000003L

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], sidp: Long): Array[Long] = {
    var k = 0
    while (k < K) {
      val h = (sidp * (31 * k + 7) + (17 * k + 3)) % P
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
