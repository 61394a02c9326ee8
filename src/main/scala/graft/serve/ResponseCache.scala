package graft.serve

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Row

/** Serving-edge response cache — the engine-side analogue of the
  * reference viewer's client-side API cache (data/html/assets/
  * main-BeiTHiEY.js: responses memoized per request payload with a
  * 300 s TTL). A dashboard re-issues identical scan requests on every
  * tab switch/poll; at 100 TB each repeat is a cluster job, so the
  * serving edge — not the engine — should absorb them.
  *
  * Design constraints, mirrored from the reference:
  *  - key = the full request (table identity + ScanRequest is a case
  *    class, so structural equality IS payload equality);
  *  - entries expire `ttlMs` after WRITE (the reference's fixed TTL,
  *    not sliding) — a changed table surfaces after at most one TTL;
  *  - bounded: `maxEntries` with LRU eviction, because cached viewer
  *    PAGES are driver-small (limit-bounded) but unbounded request
  *    diversity must not grow the driver heap;
  *  - only materialized ROWS are cached (the collected page a serving
  *    endpoint returns), never DataFrames/plans — a plan handle would
  *    pin Spark resources and recompute anyway on reuse.
  *
  * The clock is injectable so tests (and deterministic replays) can
  * drive expiry without sleeping.
  */
final class ResponseCache(ttlMs: Long = 300000L, maxEntries: Int = 256,
                          clock: () => Long = System.currentTimeMillis) {
  require(ttlMs > 0 && maxEntries > 0)

  private final case class Entry(rows: Seq[Row], expiresAt: Long)

  // LinkedHashMap in access order = LRU; synchronized because a
  // serving edge is multi-threaded but the critical section is tiny.
  private val entries = new java.util.LinkedHashMap[Any, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Any, Entry]): Boolean =
      size() > maxEntries
  }
  private val hitCount = new AtomicLong(0)
  private val missCount = new AtomicLong(0)

  /** The cached rows for `key`, or run `compute`, cache, and return.
    * `compute` runs OUTSIDE the lock — one slow Spark job must not
    * serialize every other endpoint; concurrent misses on the same
    * key may compute twice (last write wins), the same benign race
    * the reference client has. */
  def getOrCompute(key: Any)(compute: => Seq[Row]): Seq[Row] = {
    val now = clock()
    val cached = entries.synchronized {
      val e = entries.get(key)
      if (e != null && e.expiresAt > now) Some(e.rows) else None
    }
    cached match {
      case Some(rows) => hitCount.incrementAndGet(); rows
      case None =>
        missCount.incrementAndGet()
        val rows = compute
        entries.synchronized {
          entries.put(key, Entry(rows, now + ttlMs))
        }
        rows
    }
  }

  /** Drop every entry for `table` — the hook an ingest/refresh job
    * calls so a rewritten partition surfaces before the TTL. Keys are
    * (table, request) tuples from [[CachedScanner.scanPage]]. */
  def invalidateTable(table: String): Unit = entries.synchronized {
    val it = entries.keySet().iterator()
    while (it.hasNext) it.next() match {
      case (t: String, _) if t == table => it.remove()
      case _ =>
    }
  }

  def hits: Long = hitCount.get()
  def misses: Long = missCount.get()
  def size: Int = entries.synchronized(entries.size())
}

/** Cache-fronted page serving: compile + run the scan only on miss. */
object CachedScanner {

  /** Server-side page-size ceiling. The reference viewer always pages
    * (50 rows), but the endpoint must not trust the client: a request
    * with `limit=None` (or an absurd limit) would otherwise collect the
    * whole filtered table onto the serving driver — at 100 TB that is
    * an OOM, not a slow page. */
  val MaxPageRows: Int = 10000

  /** A served page plus whether the ceiling cut it short — without the
    * flag, a clamped un-limited group-by would be indistinguishable
    * from a complete result (and then cached as one). */
  final case class Page(rows: Seq[Row], truncated: Boolean)

  /** One viewer page through the cache, with the limit clamped to
    * `maxRows`. The cache key is the CLAMPED request, so an unlimited
    * request and an explicit `limit=maxRows` share an entry. The scan
    * fetches ONE row past the page (the [[SqlEndpoint]] trick) so
    * `truncated` is exact and costs no count(). */
  def scanPage(cache: ResponseCache, df: org.apache.spark.sql.DataFrame,
               req: ScanRequest, maxRows: Int = MaxPageRows): Page = {
    val pageLimit = req.limit.fold(maxRows)(math.min(_, maxRows))
    val bounded = req.copy(limit = Some(pageLimit))
    val got = cache.getOrCompute((bounded.table, bounded)) {
      TableScanner.scan(df, bounded.copy(limit = Some(pageLimit + 1)))
        .collect().toSeq
    }
    Page(got.take(pageLimit), got.size > pageLimit)
  }
}
