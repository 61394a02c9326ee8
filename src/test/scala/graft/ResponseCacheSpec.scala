package graft

import org.apache.spark.sql.Row

import graft.serve.{CachedScanner, ColumnFilter, ResponseCache, ScanRequest}

/** Serving-edge response cache (reference viewer: responses memoized
  * per request payload with a fixed TTL): hits, write-expiry,
  * LRU bound, table invalidation, and the cache-fronted scan. */
class ResponseCacheSpec extends SparkTestBase {

  import spark.implicits._

  private def row(i: Int) = Seq(Row(i))

  test("identical keys hit; different keys miss") {
    val c = new ResponseCache(ttlMs = 1000000L)
    var computes = 0
    def get(k: Any) = c.getOrCompute(k) { computes += 1; row(computes) }
    assert(get("a") == row(1) && get("a") == row(1) && computes == 1)
    assert(get("b") == row(2) && computes == 2)
    assert(c.hits == 1 && c.misses == 2)
  }

  test("entries expire ttlMs after write (not sliding)") {
    var now = 0L
    val c = new ResponseCache(ttlMs = 100L, clock = () => now)
    var computes = 0
    def get() = c.getOrCompute("k") { computes += 1; row(computes) }
    get()
    now = 90; assert(get() == row(1), "within TTL: cached")
    // access at t=90 must NOT slide expiry: at 110 the write is stale
    now = 110; assert(get() == row(2), "past TTL from WRITE: recomputed")
    assert(computes == 2)
  }

  test("LRU bound evicts the least recently used entry") {
    val c = new ResponseCache(ttlMs = 1000000L, maxEntries = 2)
    c.getOrCompute("a")(row(1)); c.getOrCompute("b")(row(2))
    c.getOrCompute("a")(row(1))           // touch a: b is now eldest
    c.getOrCompute("c")(row(3))           // evicts b
    assert(c.size == 2)
    var recomputed = false
    c.getOrCompute("b") { recomputed = true; row(2) }
    assert(recomputed, "evicted entry must recompute")
  }

  test("invalidateTable drops only that table's entries") {
    val c = new ResponseCache(ttlMs = 1000000L)
    c.getOrCompute(("t1", "q"))(row(1))
    c.getOrCompute(("t2", "q"))(row(2))
    c.invalidateTable("t1")
    assert(c.size == 1)
    var recomputed = false
    c.getOrCompute(("t1", "q")) { recomputed = true; row(1) }
    assert(recomputed)
    c.getOrCompute(("t2", "q")) { recomputed = false; row(2) }
    assert(recomputed, "t2 must still be cached")
  }

  test("cache-fronted scan runs the Spark job only on miss") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "tag")
    val cache = new ResponseCache(ttlMs = 1000000L)
    val req = ScanRequest(table = "t", limit = Some(10),
      sortColumn = Some("id"),
      filters = Seq(ColumnFilter("tag", "eq", Some("x"))))
    val first = CachedScanner.scanPage(cache, df, req)
    assert(first.rows.map(_.getLong(0)) == Seq(1L, 3L) && !first.truncated)
    assert(CachedScanner.scanPage(cache, df, req) == first)
    assert(cache.hits == 1 && cache.misses == 1)
    // a structurally different request is its own entry
    CachedScanner.scanPage(cache, df, req.copy(limit = Some(1)))
    assert(cache.misses == 2)
  }

  test("un-paged request is clamped to the server-side page ceiling") {
    val df = (1L to 20L).toSeq.toDF("id")
    val cache = new ResponseCache(ttlMs = 1000000L)
    val unlimited = ScanRequest(table = "t", limit = None, sortColumn = Some("id"))
    val p1 = CachedScanner.scanPage(cache, df, unlimited, maxRows = 5)
    assert(p1.rows.size == 5 && p1.truncated,
      "limit=None must clamp AND report the cut")
    // an oversized explicit limit is clamped too…
    assert(CachedScanner.scanPage(cache, df, unlimited.copy(limit = Some(1000)),
      maxRows = 5).rows.size == 5)
    // …and both normalize to the same cache entry as an explicit max
    assert(CachedScanner.scanPage(cache, df, unlimited.copy(limit = Some(5)),
      maxRows = 5).rows.size == 5)
    assert(cache.misses == 1 && cache.hits == 2,
      "clamped requests must share one cache entry")
    // a page that fits under the ceiling is NOT flagged
    val small = CachedScanner.scanPage(cache, df, unlimited, maxRows = 50)
    assert(small.rows.size == 20 && !small.truncated)
  }
}
