package graft.operators

/** JVM-level build-once cache backing the `*_probe` benchmark queries.
  *
  * A secondary index (trigram postings, z-order layout + min/max file
  * stats) is built ONCE and probed many times — that is its entire
  * economic argument. Timing `build + probe` per query, as the cold
  * `grep_search` / `layout_file_skip` entries do, reports the amortized
  * cost as if it were marginal. The probe variants route their index
  * through this cache so the first invocation pays the build and every
  * later one times the probe alone — the serving-path number.
  *
  * Values are small handles: a localCheckpoint'ed index frame or a
  * written directory path — never raw corpus data.
  *
  * Lifetime: entries are scoped to the SparkContext that built them —
  * a checkpointed frame's blocks die with its context, so a new
  * session in the same JVM (spec suites, notebook restarts) must
  * rebuild rather than query a dead handle. Staleness against the
  * UNDERLYING FILES is, as in any secondary index, the caller's
  * contract: regenerate the data, call [[invalidate]] (or rebuild the
  * session). The in-repo fixture dirs are read-only by convention.
  */
object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  private def contextEpoch(): String = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    s"${sc.applicationId}/${sc.applicationAttemptId.getOrElse("0")}"
  }

  def getOrBuild[T <: AnyRef](key: String)(build: => T): T = {
    val epoch = contextEpoch()
    cache.compute(key, (_, prev) =>
      if (prev != null && prev._1 == epoch) prev else (epoch, build)
    )._2.asInstanceOf[T]
  }

  /** Drop a key (underlying data changed) or everything (key = None). */
  def invalidate(key: Option[String] = None): Unit = key match {
    case Some(k) => cache.remove(k)
    case None    => cache.clear()
  }
}
