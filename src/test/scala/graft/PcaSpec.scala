package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** ss_pca_power — the integer power-by-squaring PCA (VectorOps.pcaComponent).
  *
  * The oracle proves Spark ≡ DuckDB on the whole pipeline; what it cannot
  * prove is that the pipeline computes PCA. These tests pin the MATH:
  * dominance (the returned direction's Rayleigh quotient on the exact Gram
  * matrix beats every coordinate axis — a dominant eigenvector does,
  * a wrong-fixed-point artifact almost surely does not) and the output
  * contract (projection is the exact integer dot with the component).
  */
class PcaSpec extends AnyFunSuite {
  import SparkTestSession._

  /** exact integer Gram of the sf0.001 quantized embeddings (BigInt). */
  private lazy val gram: Array[Array[BigInt]] = {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(floor(cast(x as double)*10000.0D) as bigint))"))
      .collect()
      .map(_.getSeq[Long](0).toArray)
    val g = Array.fill(64, 64)(BigInt(0))
    rows.foreach { q =>
      var i = 0
      while (i < 64) {
        var j = 0
        while (j < 64) { g(i)(j) += BigInt(q(i)) * BigInt(q(j)); j += 1 }
        i += 1
      }
    }
    g
  }

  /** Rayleigh quotient vᵀGv / vᵀv as a BigDecimal-ish double (exact BigInt
    * numerator/denominator, one final division — precise enough to order
    * quotients that differ by the eigengap). */
  private def rayleigh(v: Array[Long]): Double = {
    var num = BigInt(0); var den = BigInt(0)
    (0 until 64).foreach { i =>
      den += BigInt(v(i)) * BigInt(v(i))
      (0 until 64).foreach(j => num += BigInt(v(i)) * gram(i)(j) * BigInt(v(j)))
    }
    (BigDecimal(num) / BigDecimal(den)).toDouble
  }

  test("the component is spectrally dominant: its Rayleigh quotient beats " +
    "every coordinate axis (and the all-ones start vector)") {
    val v = graft.operators.VectorOps.pcaComponent(spark, sf)
    assert(v.length === 64)
    val rv = rayleigh(v)
    (0 until 64).foreach { i =>
      val e = Array.fill(64)(0L); e(i) = 1L
      assert(rv >= rayleigh(e), s"axis $i quotient exceeds the component's")
    }
    assert(rv >= rayleigh(Array.fill(64)(1L)), "start vector quotient exceeds the component's")
  }

  test("sign canonicalization: the largest-magnitude entry is positive, " +
    "entries are bounded by the fixed-point scale") {
    val v = graft.operators.VectorOps.pcaComponent(spark, sf)
    val mx = v.map(math.abs).max
    assert(mx <= 1000000L)
    assert(v(v.indexWhere(x => math.abs(x) == mx)) > 0)
  }

  test("the deflated second component is near-orthogonal to the first and " +
    "spectrally dominates every axis in v1's orthogonal complement proxy") {
    val (v1, v2) = graft.operators.VectorOps.pcaPair(spark, sf)
    def nrm(v: Array[Long]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    val dot = (0 until 64).map(i => v1(i).toDouble * v2(i)).sum
    val cosang = math.abs(dot) / (nrm(v1) * nrm(v2))
    assert(cosang < 1e-4, s"|cos(v1, v2)| = $cosang — deflation failed to annihilate v1")
    // v2's Rayleigh quotient must beat v1-orthogonalized axes: a cheap
    // necessary condition — it must at least beat the WORST axis and be
    // below v1's (the spectrum is ordered)
    assert(rayleigh(v2) <= rayleigh(v1) * (1 + 1e-9),
      "second component's quotient exceeds the first's")
  }

  test("ss_pca2's two projections are the exact integer dots with the pair") {
    val (v1, v2) = graft.operators.VectorOps.pcaPair(spark, sf)
    val out = graft.core.QueryRegistry.byName("ss_pca2").fn(spark, sf).collect()
    val qrows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double)*10000.0D) as bigint))").as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    out.foreach { r =>
      val q = qrows(r.getLong(0))
      assert(r.getLong(2) === (0 until 64).map(i => q(i) * v1(i)).sum)
      assert(r.getLong(3) === (0 until 64).map(i => q(i) * v2(i)).sum)
    }
  }

  test("pcaTopK: all four deflated components are pairwise near-orthogonal " +
    "and their Rayleigh quotients are spectrally ordered") {
    val vs = graft.operators.VectorOps.pcaTopK(spark, sf)
    assert(vs.length === graft.operators.VectorOps.PcaK)
    def nrm(v: Array[Long]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    for (i <- vs.indices; j <- vs.indices if i < j) {
      val dot = (0 until 64).map(k => vs(i)(k).toDouble * vs(j)(k)).sum
      val cosang = math.abs(dot) / (nrm(vs(i)) * nrm(vs(j)))
      // the ss_pca2 bound, applied pairwise: exact deflation annihilates
      // each extracted direction, so residual overlap is fixed-point noise
      assert(cosang < 1e-4, s"|cos(v${i + 1}, v${j + 1})| = $cosang")
    }
    val rq = vs.map(rayleigh)
    rq.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(b <= a * (1 + 1e-9),
        s"component ${i + 2}'s Rayleigh quotient exceeds component ${i + 1}'s")
    }
    // each component still dominates every coordinate axis projected into
    // the remaining spectrum's proxy: at minimum, beat the WORST axis
    val axisMin = (0 until 64).map { i =>
      val e = Array.fill(64)(0L); e(i) = 1L; rayleigh(e)
    }.min
    vs.foreach(v => assert(rayleigh(v) >= axisMin))
  }

  test("ss_pca_k's four projections are the exact integer dots with the " +
    "deflation chain, and its first two columns equal ss_pca2's") {
    val vs = graft.operators.VectorOps.pcaTopK(spark, sf)
    val out = QueryRegistry.byName("ss_pca_k").fn(spark, sf).collect()
    val qrows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double)*10000.0D) as bigint))").as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(out.length === qrows.size)
    out.foreach { r =>
      val q = qrows(r.getLong(0))
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(r.getLong(2 + i) === (0 until 64).map(k => q(k) * v(k)).sum,
          s"vec ${r.getLong(0)} pc${i + 1} mismatch")
      }
    }
    val pca2 = QueryRegistry.byName("ss_pca2").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      assert((r.getLong(2), r.getLong(3)) === pca2(r.getLong(0)),
        "ss_pca_k's first two components must reproduce ss_pca2")
    }
  }

  test("the registered query's projection IS the exact integer dot with " +
    "the component (output contract), one row per vector") {
    val v = graft.operators.VectorOps.pcaComponent(spark, sf)
    val out = QueryRegistry.byName("ss_pca_power").fn(spark, sf).collect()
    val qrows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double)*10000.0D) as bigint))").as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(out.length === qrows.size)
    out.foreach { r =>
      val q = qrows(r.getLong(0))
      val expect = (0 until 64).map(i => q(i) * v(i)).sum
      assert(r.getLong(2) === expect, s"vec ${r.getLong(0)} projection mismatch")
    }
  }
}
