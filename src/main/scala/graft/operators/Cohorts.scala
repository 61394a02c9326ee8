package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group users by the period of their first
  * qualifying activity (the cohort), then measure what fraction of each
  * cohort is still active N periods later — the classic retention
  * triangle behind every growth dashboard.
  *
  * Scale shape: the event log collapses FIRST to distinct
  * (user, period) — one partial-agg distinct whose size is
  * |users| × |periods|, orders of magnitude below |events| — and
  * everything after operates on that frame: first-period per user is a
  * groupBy on the same user key (exchange reuse), the activity join is
  * user-keyed, and the final (cohort, offset) rollup plus the
  * cohort-size join work on frames bounded by |users| and
  * |cohorts × offsets|. The cohort-size side is a few hundred rows at
  * most — AQE converts that join to a broadcast at runtime.
  *
  * Periods are exact integer division on epoch-micros (`div`), so
  * cohort ids are reproducible longs, not timezone-dependent dates.
  */
object Cohorts {

  /** One row per (cohort, offset): users from `cohort` active at
    * `cohort + offset`, and the retained fraction of the cohort.
    *
    * @param periodUs cohort granularity in micros (86400000000L = daily)
    * @param activity which events count as "active" (e.g. purchases)
    */
  def retention(events: DataFrame, userCol: String, tsUsCol: String,
                periodUs: Long, activity: Column): DataFrame = {
    val u = col(userCol)
    // up feeds both the first-period groupBy and the activity join;
    // first feeds both the join and the cohort sizes. Catalyst does
    // not CSE across branches — materialize each once so the event
    // scan and the distinct collapse happen exactly once (AQE restores
    // the broadcast decisions from true runtime sizes).
    val up = events.filter(activity)
      .select(u, expr(s"$tsUsCol div ${periodUs}L").as("__period"))
      .distinct()
      .localCheckpoint()
    val first = up.groupBy(u).agg(min(col("__period")).as("__cohort"))
      .localCheckpoint()
    val sizes = first.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("__n_cohort"))
    val act = up.join(first, Seq(userCol))
      .groupBy(col("__cohort"), (col("__period") - col("__cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    act.join(sizes, Seq("__cohort"))
      .select(col("__cohort").as("cohort"), col("offset"), col("n_active"),
        graft.queries.round4(
          col("n_active").cast("double") / col("__n_cohort")).as("retention"))
  }
}
