package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wei

/** Money-math vectors hand-computed from the reference formulas
  * (mocexchange.py:46-89 mint, :153-181 redeem; SURVEY.md §2.8 F1-F6),
  * including truncation-toward-zero on negatives (Python int()).
  */
class WeiSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("F1 weiToDec is exact x/10^18") {
    val df = Seq("1500000000000000000", "1", "0").toDF("wei")
      .select(Wei.weiToDec(col("wei")).cast("string").as("d"))
    val got = df.collect().map(_.getString(0))
    assert(BigDecimal(got(0)) == BigDecimal("1.5"))
    assert(BigDecimal(got(1)) == BigDecimal("1E-18"))
    assert(BigDecimal(got(2)) == BigDecimal(0))
  }

  test("F2 toWeiStr truncates toward zero, both signs") {
    // products carry scale-20 precision into truncToWei (a tuple encoder
    // would clip at scale 18, so build the deep-scale values via mulExact):
    // 3.999999999999999999 * 0.5  = 1.9999999999999999995 -> 1999999999999999999
    // -4.199999999999999999 * 0.5 = -2.0999999999999999995 -> -2099999999999999999
    //   (Python int() truncates toward zero; floor would give ...000)
    // -2.1 * 1e-18 = -2.1e-18 -> *1e18 = -2.1 -> -2
    val df = Seq(
      ("3999999999999999999", "-4199999999999999999", "-2100000000000000000"))
      .toDF("a", "b", "c")
      .select(
        Wei.toWeiStr(Wei.mulExact(Wei.weiToDec(col("a")), Wei.weiToDec(lit("500000000000000000")))).as("a"),
        Wei.toWeiStr(Wei.mulExact(Wei.weiToDec(col("b")), Wei.weiToDec(lit("500000000000000000")))).as("b"),
        Wei.toWeiStr(Wei.mulExact(Wei.weiToDec(col("c")), Wei.weiToDec(lit("1")))).as("c"))
    val r = df.collect()(0)
    assert(r.getString(0) === "1999999999999999999")
    assert(r.getString(1) === "-2099999999999999999")
    assert(r.getString(2) === "-2")
  }

  test("F3 usdAmount: fromWei(amount) * fromWei(price)") {
    // amount = 2.5 rbtc, price = 40000.123 usd -> 100000.3075 usd
    val df = Seq(("2500000000000000000", "40000123000000000000000"))
      .toDF("amt", "price")
      .select(Wei.toWeiStr(Wei.usdAmount(col("amt"), col("price"))).as("usd"))
    assert(df.collect()(0).getString(0) === "100000307500000000000000")
  }

  test("F4 commission fallback: rbtc>0 uses reservePrice else moc leg") {
    val rows = Seq(
      // (commission, reserveTokenMarkup, btcMarkup, mocCommissionValue, mocMarkup, reservePrice, mocPrice)
      ("1000000000000000000", null, "500000000000000000", "0", "0", "2000000000000000000", "3000000000000000000"),
      ("0", null, "0", "4000000000000000000", "1000000000000000000", "2000000000000000000", "3000000000000000000"))
      .toDF("c", "rtm", "bm", "mcv", "mm", "rp", "mp")
    val (rbtc, moc, usd) = Wei.commissions(
      col("c"), col("rtm"), col("bm"), col("mcv"), col("mm"), col("rp"), col("mp"))
    val got = rows.select(Wei.toWeiStr(rbtc).as("rbtc"),
      Wei.toWeiStr(moc).as("moc"), Wei.toWeiStr(usd).as("usd")).collect()
    // row0: rbtc = 1.5, usd = 1.5*2 = 3
    assert(got(0).getString(0) === "1500000000000000000")
    assert(got(0).getString(2) === "3000000000000000000")
    // row1: rbtc = 0 -> moc leg: (4+1)*3 = 15
    assert(got(1).getString(1) === "5000000000000000000")
    assert(got(1).getString(2) === "15000000000000000000")
  }

  test("F5/F6 mint and redeem totals with gas fee, negative redeem total") {
    val rows = Seq(
      ("10000000000000000000", "100000000000000000", "21000", "50000000000")) // 10 rbtc, 0.1 comm, 21000 gas @ 50 gwei
      .toDF("reserveTotal", "comm", "gasUsed", "gasPrice")
    val fee = Wei.gasFee(col("gasUsed"), col("gasPrice")) // 0.00105
    val mint = Wei.mintTotalWei(col("reserveTotal"), col("comm"), lit(null), fee)
    val redeem = Wei.redeemTotalWei(col("reserveTotal"), col("comm"), lit(null), fee)
    val r = rows.select(mint.cast("string").as("m"), redeem.cast("string").as("r")).collect()(0)
    assert(r.getString(0) === "10101050000000000000") // 10 + 0.1 + 0.00105
    assert(r.getString(1) === "9898950000000000000")  // 10 - 0.1 - 0.00105

    // negative total: reserve 0.05, comm 0.1 -> -0.05105; usdTotal reapplies sign
    val neg = Seq(("50000000000000000", "100000000000000000", "21000", "50000000000", "2000000000000000000000"))
      .toDF("reserveTotal", "comm", "gasUsed", "gasPrice", "price")
    val negTotal = Wei.redeemTotalWei(col("reserveTotal"), col("comm"), lit(null),
      Wei.gasFee(col("gasUsed"), col("gasPrice")))
    val out = neg.select(negTotal.cast("string").as("t"),
      Wei.toWeiStr(Wei.usdTotal(negTotal, col("price"))).as("usd")).collect()(0)
    assert(out.getString(0) === "-51050000000000000")
    assert(out.getString(1) === "-102100000000000000000") // -0.05105 * 2000
  }

  test("mulExact overflows to null past 18 integer digits (documented bound)") {
    // 10^10 ether * 10^9 = 10^19 > 10^18 bound -> null (Spark-style
    // null-on-overflow, not a runtime throw)
    val df = Seq(("10000000000000000000000000000", "1000000000000000000000000000"))
      .toDF("a", "p")
      .select(
        Wei.mulExact(Wei.weiToDec(col("a")), Wei.weiToDec(col("p"))).as("over"),
        Wei.mulExact(Wei.weiToDec(col("a")), Wei.weiToDec(lit("1000000000000000000"))).as("ok"))
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDecimal(1) != null && BigDecimal(r.getDecimal(1)) == BigDecimal("10000000000"))
  }
}
