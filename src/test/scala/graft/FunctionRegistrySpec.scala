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

  test("int_dot from SQL: dot product, norm self-product, null array, length mismatch") {
    val r = spark.sql(
      """SELECT int_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |  int_dot(array(3L, -4L), array(3L, -4L)) AS nrm,
        |  int_dot(cast(null as array<bigint>), array(1L)) AS n,
        |  int_dot(array(2L, 10L), array(7L)) AS short""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) === 32L && r.getLong(1) === 25L && r.isNullAt(2)
      && r.getLong(3) === 14L)
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
