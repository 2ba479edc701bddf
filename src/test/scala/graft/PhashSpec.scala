package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryRegistry
import graft.plans.Phash

/** Phash / PhashExpr / mm_phash_dedup — the perceptual-hash image-dedup
  * leg of the multimodal family. The oracle pins engine equivalence of the
  * md5→DCT→band pipeline; these tests pin the BYTE layer the oracle cannot
  * see (it recomputes gray from doc_id, never touching the BMP bytes):
  * parse∘generate identity, malformed-payload rejection, and the dedup
  * quality the fixture was calibrated for.
  */
class PhashSpec extends AnyFunSuite {
  import SparkTestSession._

  /** reference hash computed from the gray FORMULA (no bytes) — what the
    * oracle derives; the expression must reproduce it from the bytes. */
  private def refHash(doc: Long): Long = {
    var hash = 0L
    for (u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0) {
      var coef = 0L
      for (y <- 0 until 16; x <- 0 until 16)
        coef += Phash.grayAt(doc, x, y) * Phash.Ct(u)(x) * Phash.Ct(v)(y)
      if (coef > 0) hash |= 1L << (u * 8 + v - 1)
    }
    hash
  }

  test("parse∘generate identity: the hash read back from the BMP bytes " +
    "equals the hash of the gray formula, for every variant") {
    (0L until 12L).foreach { doc =>
      val h = Phash.phash(Phash.bmpPixelFixture(doc))
      assert(h != null, s"doc $doc: fixture did not parse")
      assert(h.longValue() === refHash(doc), s"doc $doc: byte round-trip drifted")
    }
  }

  test("hashes are non-negative 63-bit values") {
    (0L until 8L).foreach { doc =>
      val h = Phash.phash(Phash.bmpPixelFixture(doc)).longValue()
      assert(h >= 0L, s"doc $doc hash has bit 63 set")
    }
  }

  test("malformed payloads hash to null, not garbage") {
    assert(Phash.phash(null) == null)
    assert(Phash.phash(Array[Byte]()) == null)
    assert(Phash.phash("not a bmp".getBytes) == null)
    // right magic, wrong dims (the header-only 54-byte fixture is 8x8-free)
    assert(Phash.phash(graft.plans.ImageMeta.bmpFixture(32, 32)) == null)
    // truncated pixel array: header promises 16x16 but bytes end early
    val full = Phash.bmpPixelFixture(0L)
    assert(Phash.phash(full.take(full.length - 10)) == null)
    // crafted pixel-offset near Int.MaxValue: `off + stride*Dim` wraps
    // negative in 32-bit, so an Int-arithmetic bounds check would pass and
    // the pixel loop would throw (killing a whole imageDupGate micro-batch)
    // instead of returning null — the guard must run in Long arithmetic
    val huge = full.clone()
    huge(10) = 0xf8.toByte; huge(11) = 0xff.toByte
    huge(12) = 0xff.toByte; huge(13) = 0x7f.toByte // off = Int.MaxValue - 7
    assert(Phash.phash(huge) == null)
  }

  test("probe/intra-batch reject a maxHamming beyond the pigeonhole bound") {
    import spark.implicits._
    val idx = Seq((1L, 5L)).toDF("img_id", "ph")
    intercept[IllegalArgumentException] {
      graft.operators.ImageDup.probeImageIndex(idx, idx, maxHamming = 4L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.ImageDup.intraBatchImageDups(idx, maxHamming = 7L)
    }
  }

  test("mm_phash_dedup finds only intra-cluster pairs and nearly all of them") {
    val rows = QueryRegistry.byName("mm_phash_dedup").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a / 4 === b / 4, s"($a, $b) crosses clusters — false positive")
      assert(h <= 3L)
    }
    // recall vs the 6-pairs-per-cluster truth: hamming-4 twins may drop
    // (the documented threshold trade) but the miss rate must stay small
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val truth = (docs / 4) * 6
    assert(rows.length >= truth * 9 / 10,
      s"recall ${rows.length}/$truth below 0.9")
  }
}
