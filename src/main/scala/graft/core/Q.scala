package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a DataFrame program plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB SQL string used by the
  * driver's oracle compare (CORRECTNESS gate, see SparkEntry).
  *
  * Column names of `fn`'s result and the oracle SQL's result MUST match —
  * the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** queries worth timing in Bench (headline set) */
    bench: Boolean = false)

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
}
