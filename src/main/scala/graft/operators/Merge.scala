package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table maintenance (MERGE INTO semantics) — how a 100 TB
  * lakehouse table absorbs a (much smaller) change feed without a
  * rewrite of the world:
  *
  *  - `upsert`: update-wins merge. One anti join (broadcast when the
  *    update feed is small, the common case) + union — the base table
  *    is never shuffled on its own key. Combined with a partitioned
  *    sink (see streaming.IncrementalRefresh) only touched partitions
  *    rewrite.
  *  - `scd2`: slowly-changing-dimension type-2 history — instead of
  *    overwriting, the matched current row is CLOSED (valid_to set to
  *    the update's effective time) and the update appended as the new
  *    open version. Point-in-time queries then filter
  *    `valid_from <= t AND (valid_to IS NULL OR valid_to > t)`.
  *
  * Both are pure joins/unions: Catalyst broadcasts the feed side and
  * the plans stay one-pass over the base.
  */
object Merge {

  /** Update-wins keyed upsert: rows of `base` whose key appears in
    * `updates` are replaced; new keys are appended. Schemas must match. */
  def upsert(base: DataFrame, updates: DataFrame,
             keyCols: Seq[String]): DataFrame =
    base.join(broadcast(updates.select(keyCols.map(col): _*)),
        keyCols, "left_anti")
      .unionByName(updates)

  /** SCD2 history merge. `base` carries (key..., attrs..., valid_from,
    * valid_to) with `valid_to IS NULL` marking current rows; `updates`
    * carries (key..., attrs..., tsCol) — every update row closes the
    * key's current version at its timestamp and opens a new one. */
  def scd2(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
           tsCol: String): DataFrame = {
    val keyExprs = keyCols.map(col)
    val history = base.filter(col("valid_to").isNotNull)
    val current = base.filter(col("valid_to").isNull)
    val feedTs = updates.select(keyExprs :+ col(tsCol).as("__new_ts"): _*)
    // close matched current rows; unmatched stay open untouched
    val closed = current.join(broadcast(feedTs), keyCols, "left")
      .withColumn("valid_to", coalesce(col("__new_ts"), col("valid_to")))
      .drop("__new_ts")
    val opened = updates
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("valid_to", lit(null).cast(base.schema("valid_to").dataType))
    history.unionByName(closed).unionByName(opened)
  }
}
