package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry

/** ss_bitext_mine — margin-based parallel-pair mining (VectorOps). The
  * oracle proves engine equivalence; these tests pin the mining CONTRACT
  * the SQL encodes: the even/odd shard split, the mutual-best-match
  * bijection (each src and each tgt mines at most once), and the margin
  * floor.
  */
class BitextMineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val mined =
    QueryRegistry.byName("ss_bitext_mine").fn(spark, sf).collect()

  test("pairs cross the shard split: src ids even, tgt ids odd") {
    assert(mined.nonEmpty, "no pairs mined at sf0.001")
    mined.foreach { r =>
      assert(r.getLong(0) % 2 === 0L, s"src ${r.getLong(0)} not in the even shard")
      assert(r.getLong(1) % 2 === 1L, s"tgt ${r.getLong(1)} not in the odd shard")
    }
  }

  test("mutual best match is a partial bijection: no src or tgt mines twice") {
    val srcs = mined.map(_.getLong(0))
    val tgts = mined.map(_.getLong(1))
    assert(srcs.distinct.length === srcs.length, "a src mined two partners")
    assert(tgts.distinct.length === tgts.length, "a tgt mined two partners")
  }

  test("every mined margin clears the scaled 1.05 ratio floor") {
    mined.foreach(r => assert(r.getLong(2) >= 1050000L,
      s"pair (${r.getLong(0)}, ${r.getLong(1)}) margin ${r.getLong(2)} below floor"))
  }
}
