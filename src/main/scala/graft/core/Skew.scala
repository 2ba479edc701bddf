package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew mitigation — SURVEY.md §7.1 step 8 / the 100 TB design notes: AQE's
  * skew-join split handles moderate skew at runtime for sort-merge joins;
  * explicit salting is the fallback when a single hot key (one address
  * holding a large fraction of all events is the canonical MOC case)
  * exceeds what a runtime split can fix — e.g. when the join must be
  * shuffled-hash, or the hot partition exceeds executor memory.
  */
object Skew {

  /** Deterministic salted equi-join of a skewed `big` side against a
    * per-key `small` side: the big side scatters each row into one of
    * `factor` sub-partitions via a hash of the WHOLE row (no rand() — the
    * plan stays deterministic and re-runnable), the small side replicates
    * `factor`× , and the join key becomes (key, salt). Inner-join
    * semantics are preserved exactly: every big row meets precisely the
    * one replica carrying its salt.
    *
    * Cost model: small side grows ×factor (it is per-key — tiny); the hot
    * key's rows spread across `factor` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(factor)).cast(IntegerType))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
