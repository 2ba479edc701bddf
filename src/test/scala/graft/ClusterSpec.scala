package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** connectedComponents must label whole components — including long, thin
  * ones whose diameter far exceeds any per-round hop count — because it
  * pointer-jumps (O(log diameter) rounds), and it must fail loudly rather
  * than emit wrong labels when its round cap is too small.
  */
class ClusterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("path graph with diameter 199 collapses to one component") {
    // 0-1-2-...-199: a single chain, diameter 199 (old capped propagation
    // at 30 hops would mislabel the tail)
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = TextOps.connectedComponents(pairs).collect()
    assert(labels.length === 200)
    assert(labels.forall(_.getLong(1) === 0L), "every node must carry the component min")
  }

  test("disjoint components keep distinct min labels") {
    // two chains and an isolated edge
    val pairs = ((10L until 20L).map(i => (i, i + 1)) ++
      (50L until 55L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      .toDF("doc_a", "doc_b")
    val byLabel = TextOps.connectedComponents(pairs).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).sorted.toSeq).toMap
    assert(byLabel.keySet === Set(10L, 50L, 100L))
    assert(byLabel(10L) === (10L to 20L))
    assert(byLabel(50L) === (50L to 55L))
    assert(byLabel(100L) === Seq(100L, 101L))
  }

  test("an insufficient round cap fails loudly instead of mislabeling") {
    val pairs = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException] {
      TextOps.connectedComponents(pairs, maxRounds = 2).collect()
    }
  }
}
