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
  // Per-CALL clone, deliberately uncached. A clone is cheap (a
  // SessionState copy) and fully GC-able: nothing global pins it —
  // even the ExecutionListenerBus a body's `observe` may lazily
  // register on the shared LiveListenerBus holds only the clone's
  // UUID STRING, never the session (verified against the shipped
  // spark-sql 4.1.2 bytecode), so the session memory is reclaimed
  // when the call returns and only that one empty, tagged bus object
  // outlives it (none at all for bodies that never observe). A cache
  // was tried and reverted: value→parentSessionState→base-session
  // back-references defeat weak-key eviction (the textbook WeakHashMap
  // self-reference leak), data-dependent conf values key unboundedly
  // many entries, and a cached clone freezes the base session's
  // runtime confs at first-call time — three bugs for one saved
  // SessionState copy.
  private def cloneFor(s0: classic.SparkSession,
                       confs: Map[String, String]): classic.SparkSession = {
    val s1 = s0.cloneSession()
    confs.foreach { case (key, value) => s1.conf.set(key, value) }
    s1
  }

  def withConf(df: DataFrame, confs: Map[String, String])(
      body: DataFrame => DataFrame): DataFrame = {
    val s0 = df.sparkSession.asInstanceOf[classic.SparkSession]
    val out = body(classic.Dataset.ofRows(
      cloneFor(s0, confs), df.queryExecution.logical))
    // The override only governs what EXECUTES inside the body — so the
    // returned frame must already be lineage-truncated (its per-round
    // actions ran on the clone; what comes back is a block scan / local
    // rows). A lazy return would silently RE-plan and RE-execute the
    // body's work under the caller's DEFAULT confs — the exact bug
    // class this helper exists to close — so refuse it loudly. The
    // check is on the plan ROOT, not its leaves: even one pending
    // operator over a checkpointed leaf (an aggregate, a join) is
    // deferred work that would run unscoped.
    val truncated = out.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
    require(truncated,
      "SessionScope.withConf body must return a checkpointed/local frame " +
        "(lineage-truncated); a lazy plan would re-execute under the " +
        "caller's default confs, silently dropping the overrides")
    classic.Dataset.ofRows(s0, out.queryExecution.logical)
  }

  /** Evaluate ONE action — `df.head()` — under conf overrides visible
    * only to that action. No lazy-return hazard: the value, not a
    * plan, crosses back. For scoped builds of driver-side artifacts
    * (e.g. a Bloom filter aggregated under raised sketch-size caps). */
  def headUnderConf(df: DataFrame,
                    confs: Map[String, String]): org.apache.spark.sql.Row = {
    val s0 = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cloneFor(s0, confs),
      df.queryExecution.logical).head()
  }
}
