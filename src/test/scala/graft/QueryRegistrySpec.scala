package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class QueryRegistrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("registry names are unique and every query has a column set") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every registered query runs at sf0.001, schema stable, and leaves " +
    "the session CacheManager EMPTY (cache-hygiene gate)") {
    // The round-11 lesson: a query builder's persist() without unpersist
    // (a) leaks session-lifetime memory per execution and (b) is silently
    // substituted by the CacheManager into ANY sibling query that builds
    // the identical logical frame, mutating the sibling's physical plan
    // (tx_dsir lost its pinned ReusedExchange to tx_dsir_drift's leaked
    // featurization cache). This gate would have caught that before
    // commit: after EACH registered query builds and executes, the
    // CacheManager must be empty — multi-consumer pins inside a query
    // must be localCheckpoint (which never registers there), and paired
    // persist/unpersist must actually unpersist on every path.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.clearAllCache(spark) // earlier suites' state is not ours
    QueryRegistry.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
      val leaked = ColumnBridge.leakedCachePlans(spark)
      assert(leaked.isEmpty,
        s"${q.name} left persisted frames in the session CacheManager:\n  " +
          leaked.mkString("\n  "))
    }
  }

  test("page-size clamp snaps to the allowed set (lib_tools getPagination)") {
    import graft.operators.Api.clampPageSize
    assert(clampPageSize(20) === 20)
    assert(clampPageSize(25) === 20)
    assert(clampPageSize(40) === 40)
    assert(clampPageSize(500) === 40)
    assert(clampPageSize(1) === 20) // below minimum → default
  }

  test("deterministic-HLL distinct-actives lands within 3 sigma of exact") {
    // m=64 registers → ~1.04/sqrt(64) ≈ 13% expected relative error; bound
    // at 3σ. The row carries its own exact count, which must equal the
    // countDistinct baseline exactly. Runs at sf0.01 (n=150): sf0.001's 15
    // distinct users sit in the small-range regime the raw estimator
    // deliberately doesn't correct for (a cross-engine-exact ln() doesn't
    // exist; n ≫ 2.5m holds at every real verify/bench scale).
    val hsf = "/root/testdata/sf0.01"
    val row = QueryRegistry.byName("a1b_approx_distinct").fn(spark, hsf).collect()(0)
    val exactInRow = row.getAs[Long]("n_users_exact").toDouble
    val approx = row.getAs[Double]("n_users_approx")
    val exact = QueryRegistry.byName("a1_distinct_users").fn(spark, hsf)
      .collect()(0).getLong(0).toDouble
    assert(exactInRow === exact, s"exact-in-row $exactInRow vs baseline $exact")
    assert(math.abs(approx - exact) / exact <= 0.39,
      s"approx $approx vs exact $exact")
  }

  test("memoized-artifact queries are keyed by dataset — no cross-dataset bleed") {
    // every shared-artifact cache (winnow pairs, cluster labels, classifier
    // state, ANN indexes, incremental splits, bucketed tables) keys on
    // (session, dataset dir); a key bug would serve one dataset's artifact
    // to another's query. Drive representative consumers at BOTH scales in
    // one session, in both orders, and check the row counts differ and
    // repeat-calls are stable.
    // documents/embeddings are IDENTICAL between sf0.001 and sf0.01 (both
    // 500 docs), so the contrast dataset must be sf0.1 for corpus-keyed
    // queries; events DO scale 1k → 10k, so lo_bucketed_join contrasts
    // against sf0.01.
    val sf1 = "/root/testdata/sf0.1"
    for (q <- Seq("dd_cluster", "tx_train_val_split", "dd_incremental_lsh",
        "tx_classifier_score")) {
      val fn = QueryRegistry.byName(q).fn
      val small1 = fn(spark, sf).count()
      val big1 = fn(spark, sf1).count()
      val small2 = fn(spark, sf).count()
      assert(small1 !== big1, s"$q: sf0.001 and sf0.1 row counts collide")
      assert(small1 === small2, s"$q: repeat call at sf0.001 changed")
    }
    val bj = QueryRegistry.byName("lo_bucketed_join").fn
    assert(bj(spark, sf).count() !== bj(spark, "/root/testdata/sf0.01").count(),
      "lo_bucketed_join: per-user rows must differ between event scales")
    // fixed 16×5 output shape — compare CONTENT across scales instead
    val ivf = QueryRegistry.byName("ss_topk_ivfpq").fn
    val smallRows = ivf(spark, sf).collect().map(_.toString).toSet
    val bigRows = ivf(spark, sf1).collect().map(_.toString).toSet
    assert(smallRows !== bigRows,
      "ss_topk_ivfpq: identical top-k rows across datasets — index bleed")
  }

  test("flagship q1_agg returns the 6 flag/status groups with positive sums") {
    val rows = QueryRegistry.byName("q1_agg").fn(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }
}
