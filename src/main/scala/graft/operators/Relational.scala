package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Set-oriented re-expressions of the reference's row-at-a-time relational
  * logic (SURVEY.md §2.3/§2.5/§2.9). Every operator here is shuffle-aware:
  * dims broadcast, facts stay partitioned, and the only exchanges are the
  * ones the semantics force (dropDuplicates in the dim upsert).
  */
object Relational {

  /** W1 forward-fill, unbounded variant: last non-null value of `col` up
    * to the current row within a partition. Reference semantics:
    * `previous_link` carry-forward, `import_files_to_postgre.py:143-153`.
    */
  def forwardFill(df: DataFrame, value: Column, partitionBy: Seq[Column],
                  orderBy: Seq[Column], as: String): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(value, ignoreNulls = true).over(w))
  }

  /** W1 faithful single-row-lookback variant: the reference sets
    * `previous_link` to the row's own (possibly empty) value *after* use
    * (`import_files_to_postgre.py:153`), so a blank inherits only from the
    * immediately-previous row — `lag`, not unbounded `last`.
    */
  def fillFromPrevious(df: DataFrame, value: Column, partitionBy: Seq[Column],
                       orderBy: Seq[Column], as: String): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(as, coalesce(value, lag(value, 1).over(w)))
  }

  /** W2 first-match per key (the reference's `.iloc[0]` after an equality
    * filter, `import_files_to_postgre.py:214-215`): deterministic first
    * row per key under `orderBy`.
    */
  def firstPerKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** J5 exact-duplicate suppression gate (`database_utils.py:128-145`):
    * drop incoming rows that already exist in `existing` on `keys`.
    * Plans as a broadcast/shuffled hash LEFT ANTI join — one pass, no
    * per-row probes. At 100 TB both sides shuffle on `keys`; AQE handles
    * skew.
    */
  def dedupGate(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).dropDuplicates(keys),
      keys, "left_anti")

  /** J4 get-or-create dimension upsert (`database_utils.py:57-113`):
    * `existing` is the current dim (naturalKey, idCol); incoming natural
    * keys not present get fresh surrogate ids `max(existing)+row_number`,
    * assigned deterministically by natural-key order. Returns the merged
    * dim. The only shuffle is the dropDuplicates on the (small) key set;
    * the existing dim max-id is a scalar agg.
    */
  def dimUpsert(existing: DataFrame, incomingKeys: DataFrame,
                naturalKey: String, idCol: String): DataFrame = {
    val newKeys = incomingKeys.select(naturalKey).dropDuplicates(naturalKey)
      .join(existing.select(naturalKey), Seq(naturalKey), "left_anti")
    val maxId = existing.agg(coalesce(max(col(idCol)).cast("long"), lit(0L)))
      .head().getLong(0)
    val assigned = newKeys.withColumn(idCol,
      row_number().over(Window.orderBy(col(naturalKey))).cast("long") + maxId)
    existing.select(col(naturalKey), col(idCol).cast("long"))
      .unionByName(assigned.select(col(naturalKey), col(idCol)))
  }
}
