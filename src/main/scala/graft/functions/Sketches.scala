package graft.functions

import scala.reflect.runtime.universe.TypeTag

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

/** Bounded top-k typed Aggregator: keeps the k SMALLEST `(ord, id)` pairs
  * (ascending lexicographic), so the buffer crossing the shuffle is at most
  * k entries per (group, partition) — a true map-side partial top-k.
  *
  * This is the scale-correct replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(...))  WHERE rn <= k`:
  * the window shape shuffles the ENTIRE pair stream (N×K rows of
  * embedding-scale payloads at 100 TB) to rank it, while this aggregator
  * partial-aggregates each map partition down to k entries before any data
  * moves. Descending ranks (top-k by similarity) pass the negated score as
  * `ord` — IEEE negation is exact, so the round trip loses nothing.
  *
  * The buffer is a sorted Vector bounded at k: insert is O(k) (k here is
  * 2-5), merge is O(k²) worst case, both constant-space in group size.
  */
final case class BoundedTopK[A: TypeTag: Ordering](k: Int)
    extends Aggregator[(A, Long), Seq[(A, Long)], Seq[(A, Long)]] {
  private val ord: Ordering[(A, Long)] =
    Ordering.Tuple2(implicitly[Ordering[A]], implicitly[Ordering[Long]])

  override def zero: Seq[(A, Long)] = Vector.empty

  private def ins(b: Seq[(A, Long)], x: (A, Long)): Seq[(A, Long)] =
    if (b.length >= k && ord.gteq(x, b.last)) b
    else {
      val (lo, hi) = b.span(ord.lt(_, x))
      ((lo :+ x) ++ hi).take(k)
    }

  override def reduce(b: Seq[(A, Long)], x: (A, Long)): Seq[(A, Long)] = ins(b, x)
  override def merge(a: Seq[(A, Long)], b: Seq[(A, Long)]): Seq[(A, Long)] =
    b.foldLeft(a)(ins)
  override def finish(b: Seq[(A, Long)]): Seq[(A, Long)] = b

  override def bufferEncoder: Encoder[Seq[(A, Long)]] =
    ExpressionEncoder[Seq[(A, Long)]]()
  override def outputEncoder: Encoder[Seq[(A, Long)]] =
    ExpressionEncoder[Seq[(A, Long)]]()
}
