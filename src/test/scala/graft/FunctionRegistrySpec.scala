package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftFunctions

/** The custom expressions must be reachable from pure SQL after
  * registration — the workflow a SQL-only user of the engine gets.
  */
class FunctionRegistrySpec extends AnyFunSuite {
  import SparkTestSession._

  GraftFunctions.register(spark)

  test("hex_to_long decodes from SQL") {
    val r = spark.sql("SELECT hex_to_long('0x1A') AS a, hex_to_long('ff') AS b, hex_to_long('xyz') AS c")
      .collect()(0)
    assert(r.getLong(0) === 26L && r.getLong(1) === 255L && r.isNullAt(2))
  }

  test("rolling_min_hash from SQL equals the expression path") {
    val viaSql = spark.sql("SELECT rolling_min_hash('the quick brown fox jumps', 16) AS h")
      .collect()(0).getLong(0)
    val direct = graft.plans.RollingHash.minWindowHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox jumps"), 16)
    assert(viaSql === direct.longValue())
  }

  test("wei pipeline composes in SQL: trunc_wei(exact_mul(wei_to_dec, wei_to_dec))") {
    val r = spark.sql(
      """SELECT CAST(trunc_wei(exact_mul(wei_to_dec('2500000000000000000'),
        |  wei_to_dec('40000123000000000000000'))) AS STRING) AS usd""".stripMargin)
      .collect()(0).getString(0)
    assert(r === "100000307500000000000000")
  }
}
