package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.{ExactMulExpr, TruncWeiExpr, WeiToDecExpr}

/** Fixed-point wei (10^18) money arithmetic — the reference's core numeric
  * semantics (SURVEY.md §2.8 F1–F6), as exact `Column` algebra.
  *
  * The reference stores every monetary amount as a decimal string of a
  * wei-scale integer and computes with Python arbitrary-precision int /
  * Decimal (`indexer/events/mocexchange.py:46-89`): `fromWei(x) = x/10^18`
  * exactly, `toWei(d) = int(d*10^18)` truncating toward zero (also on
  * negative redeem totals, `mocexchange.py:174-181`).
  *
  * Division/multiplication go through the custom Catalyst expressions in
  * `graft.plans.WeiExpressions` — Spark's built-in decimal op typing
  * (allowPrecisionLoss) would silently round at scale 6 for these operand
  * widths. Additions stay built-in but on narrowed Decimal(26,18) operands
  * so nominal precision never exceeds 38 (no precision-loss rewrite).
  */
object Wei {
  /** ether-scale decimal for sums (26,18): 8 integer digits ≈ up to 10^8
    * ether — narrow enough that Decimal adds stay exact */
  val EtherDec: DecimalType = DecimalType(26, 18)
  /** wei-integer storage type */
  val WeiDec: DecimalType = DecimalType(38, 0)

  private def ether(c: Column): Column = c.cast(EtherDec)

  /** F1 `fromWei`: wei string/integer column → exact ether-scale decimal. */
  def weiToDec(c: Column): Column = toCol(WeiToDecExpr(toExpr(c.cast(WeiDec))))

  /** F2 `toWeiStr`: decimal → `str(int(d * 10^18))`, truncating toward 0. */
  def toWeiStr(c: Column): Column = truncToWei(c).cast(StringType)

  /** trunc-toward-zero of (c × 10^18) as a wei integer decimal */
  def truncToWei(c: Column): Column = toCol(TruncWeiExpr(toExpr(c)))

  /** exact product of two decimals (scale-20 toward-zero truncation — see
    * ExactMulExpr scaladoc for why that composes with truncToWei and for
    * the 10^18 magnitude bound / null-on-overflow behavior) */
  def mulExact(a: Column, b: Column): Column = toCol(ExactMulExpr(toExpr(a), toExpr(b)))

  /** F3 usd amount: fromWei(amount) × fromWei(price) (mocexchange.py:47-50). */
  def usdAmount(amountWei: Column, priceWei: Column): Column =
    mulExact(weiToDec(amountWei), weiToDec(priceWei))

  /** F4 commission with markup fallback (mocexchange.py:56-68):
    * rbtcCommission = commission + coalesce(reserveTokenMarkup, btcMarkup);
    * usdCommission  = rbtcCommission > 0 ? rbtcCommission × reservePrice
    *                                     : mocCommission × mocPrice
    * where mocCommission = mocCommissionValue + mocMarkup. */
  def commissions(
      commission: Column, reserveTokenMarkup: Column, btcMarkup: Column,
      mocCommissionValue: Column, mocMarkup: Column,
      reservePrice: Column, mocPrice: Column): (Column, Column, Column) = {
    val rbtc = ether(weiToDec(commission)) +
      ether(weiToDec(coalesce(reserveTokenMarkup, btcMarkup)))
    val moc = ether(weiToDec(mocCommissionValue)) + ether(weiToDec(mocMarkup))
    val usd = when(rbtc > 0, mulExact(rbtc, weiToDec(reservePrice)))
      .otherwise(mulExact(moc, weiToDec(mocPrice)))
    (rbtc, moc, usd)
  }

  /** F5 gas fee: gasUsed × fromWei(gasPrice) (mocexchange.py:76-83) */
  def gasFee(gasUsed: Column, gasPriceWei: Column): Column =
    mulExact(gasUsed.cast(DecimalType(20, 0)), weiToDec(gasPriceWei))

  /** F6 mint-side total: reserveTotal + commission [+ interests] + gasFee,
    * in the wei-integer domain (mocexchange.py:84-89). */
  def mintTotalWei(reserveTotal: Column, commissionWei: Column,
      interestsWei: Column, gasFeeEther: Column): Column =
    (reserveTotal.cast(WeiDec) + commissionWei.cast(WeiDec) +
      coalesce(interestsWei.cast(WeiDec), lit(BigDecimal(0)).cast(WeiDec)) +
      truncToWei(gasFeeEther)).cast(WeiDec)

  /** F6 redeem-side total: reserveTotal − commission [+ interests] − gasFee
    * (mocexchange.py:174-181); may go negative — sign preserved. */
  def redeemTotalWei(reserveTotal: Column, commissionWei: Column,
      interestsWei: Column, gasFeeEther: Column): Column =
    (reserveTotal.cast(WeiDec) - commissionWei.cast(WeiDec) +
      coalesce(interestsWei.cast(WeiDec), lit(BigDecimal(0)).cast(WeiDec)) -
      truncToWei(gasFeeEther)).cast(WeiDec)

  /** signed usd total from a (possibly negative) wei total: the reference's
    * abs/sign round-trip (mocexchange.py:178-181) is equivalent to a signed
    * product with toward-zero truncation, which is what mulExact+truncToWei
    * produce. */
  def usdTotal(totalWei: Column, priceWei: Column): Column =
    mulExact(weiToDec(totalWei), weiToDec(priceWei))
}
