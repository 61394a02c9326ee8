package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, classic}

/** Runs a frame-transforming body under SQL-conf overrides that are
  * visible ONLY to that body — by cloning the session (same
  * SparkContext, same cached data, a copy of the SessionState incl.
  * every runtime-set conf) and rebinding the input frame's logical
  * plan onto the clone. Any action the body triggers executes under
  * the overrides; every OTHER query on the original session — incl.
  * ones running CONCURRENTLY — never sees them, which a
  * save/set/restore of the shared session conf cannot promise (its
  * raised value is live for unrelated plans the whole time the body
  * runs). The returned frame is rebound to the original session, so
  * callers compose on the session they passed in; bodies whose result
  * must not re-execute under DEFAULT confs should return a
  * checkpointed frame (the iterative operators here already do —
  * their per-round actions run inside the body and the result is a
  * lineage-truncated block scan).
  *
  * Lives in the spark.sql namespace for `cloneSession()` /
  * `Dataset.ofRows` (both private[sql]); the public API would force a
  * `newSession()`, which resets runtime confs (shuffle partitions,
  * AQE flags…) instead of inheriting them and would silently change
  * every plan built inside the scope. */
object SessionScope {
  def withConf(df: DataFrame, confs: Map[String, String])(
      body: DataFrame => DataFrame): DataFrame = {
    val s0 = df.sparkSession.asInstanceOf[classic.SparkSession]
    val s1 = s0.cloneSession()
    confs.foreach { case (key, value) => s1.conf.set(key, value) }
    val out = body(classic.Dataset.ofRows(s1, df.queryExecution.logical))
    classic.Dataset.ofRows(s0, out.queryExecution.logical)
  }
}
