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
  * Both are pure joins/unions. The feed side broadcasts ONLY while
  * Catalyst's size estimate stays under `maxBroadcastBytes`; a
  * backfill-sized feed degrades to a shuffle join instead of OOMing
  * the driver — answers identical either way.
  */
object Merge {

  /** Default feed-broadcast ceiling (8 MiB, in line with Spark's own
    * autoBroadcastJoinThreshold order of magnitude). */
  val DefaultMaxBroadcastBytes: Long = 8L << 20

  /** Broadcast the feed only while small — see
    * [[Relational.broadcastIfSmall]]. */
  private def feedSide(df: DataFrame, maxBroadcastBytes: Long): DataFrame =
    Relational.broadcastIfSmall(df, maxBroadcastBytes)

  /** Update-wins keyed upsert: rows of `base` whose key appears in
    * `updates` are replaced; new keys are appended. Schemas must match;
    * `updates` must carry one row per key (MERGE source-uniqueness —
    * duplicate feed keys would both survive the union). */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
             maxBroadcastBytes: Long = DefaultMaxBroadcastBytes): DataFrame =
    base.join(feedSide(updates.select(keyCols.map(col): _*), maxBroadcastBytes),
        keyCols, "left_anti")
      .unionByName(updates)

  /** SCD2 history merge. `base` carries (key..., attrs..., valid_from,
    * valid_to) with `valid_to IS NULL` marking current rows; `updates`
    * carries (key..., attrs..., tsCol). The feed is first deduped to
    * its LATEST row per key (ts desc, remaining columns as a
    * deterministic tie-break) — so a feed that accumulated several
    * updates for one key applies only the newest, preserving the
    * one-open-row-per-key invariant; that row closes the key's current
    * version at its timestamp and opens the new one. */
  def scd2(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
           tsCol: String,
           maxBroadcastBytes: Long = DefaultMaxBroadcastBytes): DataFrame = {
    val keyExprs = keyCols.map(col)
    val tieBreak = updates.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == tsCol).map(col(_).desc)
    val latest = Relational.topKPerGroup(updates, keyCols,
      col(tsCol).desc +: tieBreak, 1)
    val history = base.filter(col("valid_to").isNotNull)
    val current = base.filter(col("valid_to").isNull)
    val feedTs = latest.select(keyExprs :+ col(tsCol).as("__new_ts"): _*)
    // close matched current rows; unmatched stay open untouched
    val closed = current.join(feedSide(feedTs, maxBroadcastBytes), keyCols, "left")
      .withColumn("valid_to", coalesce(col("__new_ts"), col("valid_to")))
      .drop("__new_ts")
    val opened = latest
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("valid_to", lit(null).cast(base.schema("valid_to").dataType))
    history.unionByName(closed).unionByName(opened)
  }

  /** Snapshot diff (table-versioning / CDC reconstruction): classify
    * every key across two snapshots of the same table as `added`,
    * `removed`, `changed`, or `unchanged`, carrying each compared
    * column's old/new values side by side (`old_<c>` / `new_<c>`).
    *
    * Scale shape: ONE full-outer shuffle join on the key — both
    * snapshots are projected to key + compared columns BEFORE the
    * exchange, so the shuffle moves only the audited columns, not whole
    * rows; the classification is a map-side expression over the joined
    * row. Comparison is null-safe (`<=>`), so NULL→value and
    * value→NULL both count as changes.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.select((keyCols.map(col) ++
          compareCols.map(c => col(c).as(s"${tag}_$c")) :+
          lit(1).as(s"__$tag")): _*)
    val joined = side(oldDf, "old").join(side(newDf, "new"), keyCols, "full_outer")
    val anyChanged = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__old", "__new")
  }
}
