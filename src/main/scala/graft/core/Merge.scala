package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch MERGE semantics — the reference's MongoDB write modes re-expressed
  * as pure DataFrame → DataFrame transforms (SURVEY.md §2.1 S6-S11). The
  * reference applies these row-at-a-time (`find_one_and_update`,
  * `$setOnInsert`, guarded `insert_one`, `delete_many`); here each is a
  * set-based operation whose result is the post-write table, so the same
  * function body backs (a) batch recomputation, (b) `foreachBatch`
  * micro-batch upserts in the streaming shell, and (c) a Delta
  * `MERGE INTO` rewrite on a real lakehouse.
  *
  * Scale: every operation is one key-partitioned join/anti-join — the
  * natural MERGE shuffle. Nothing collects to the driver; update sides are
  * typically small and broadcast by AQE.
  *
  * All operations require `target` and `updates` to share the natural-key
  * columns; `upsert`/`insertIfAbsent` additionally require identical
  * schemas (unionByName). `updates` must be key-unique (the reference
  * upserts one document per key; a duplicate-key update batch would
  * fan matched rows out) — dedupe with `dropDuplicates(keys)` or
  * `upsertMonotonic` when the batch may carry several versions of a key.
  */
object Merge {

  /** S6 keyed upsert, updates win (`$set` with upsert=True,
    * scan_raw_txs.py:51-54 and every event writer): target rows whose key
    * appears in `updates` are replaced; new keys are inserted. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** S7 upsert with insert-only defaults (`$set` + `$setOnInsert`,
    * mocsettlement.py:388-392): on match only `updateCols` are refreshed
    * from `updates`; on miss the full update row is inserted with
    * `insertDefaults` overriding/adding columns. */
  def upsertSetOnInsert(
      target: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String], insertDefaults: Map[String, Column]): DataFrame = {
    val matched = target.as("t")
      .join(updates.as("u"), keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _))
      .select(keys.map(k => col(s"t.$k").as(k)) ++
        target.columns.filterNot(keys.contains).map { c =>
          if (updateCols.contains(c)) col(s"u.$c").as(c) else col(s"t.$c").as(c)
        }: _*)
    val inserted0 = updates.join(target.select(keys.map(col): _*), keys, "left_anti")
    val inserted = insertDefaults.foldLeft(inserted0) { case (df, (c, v)) =>
      df.withColumn(c, v)
    }
    val untouched = target.join(updates.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(matched).unionByName(inserted, allowMissingColumns = true)
  }

  /** S8 insert-if-absent (guarded `insert_one`, mocsettlement.py:29-52):
    * existing keys keep their target row untouched; only new keys append. */
  def insertIfAbsent(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(
      updates.join(target.select(keys.map(col): _*), keys, "left_anti"))

  /** S9 update-only-if-exists (upsert=False status patch,
    * fastbtcbridge.py:69-72): matched rows take `updateCols` from
    * `updates`; unmatched update rows are dropped; unmatched target rows
    * pass through. `updateCols` values must be non-null in `updates`
    * (the reference always patches concrete values) — a null update value
    * would be indistinguishable from "no update row" and keep the target
    * value. */
  def updateIfExists(
      target: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    val u = updates.select((keys ++ updateCols).map(c => col(c).as(s"__u_$c")): _*)
    target
      .join(u, keys.map(k => col(k) === col(s"__u_$k")).reduce(_ && _), "left")
      .select(target.columns.toIndexedSeq.map { c =>
        if (updateCols.contains(c))
          coalesce(col(s"__u_$c"), col(c)).as(c)
        else col(c)
      }: _*)
  }

  /** S10 targeted delete (`delete_many`, mocsettlement.py:420-429): the
    * post-delete table. */
  def deleteWhere(target: DataFrame, cond: Column): DataFrame =
    target.filter(!cond)

  /** S10 keyed delete (per-address queue drain, mocexchange.py:574-575):
    * drop every target row whose key appears in `keysToDelete`. */
  def deleteKeys(target: DataFrame, keysToDelete: DataFrame, keys: Seq[String]): DataFrame =
    target.join(keysToDelete.select(keys.map(col): _*), keys, "left_anti")

  /** P13/S6 monotonic upsert (MERGE condition `source.version >
    * target.version`, moc_balances.py:123-136 skip-if-newer): per key the
    * row with the highest `versionCol` wins, target winning ties. */
  def upsertMonotonic(
      target: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    // __pri: target rows outrank update rows at equal version
    val all = target.withColumn("__pri", lit(1))
      .unionByName(updates.withColumn("__pri", lit(0)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__pri").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }
}
