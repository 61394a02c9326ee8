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
  */
object IndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def getOrBuild[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]
}
