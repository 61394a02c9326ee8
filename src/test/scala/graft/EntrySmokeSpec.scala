package graft

/** Smoke: every declared query runs and yields rows at sf0.001, and
  * every oracle key has a matching query. */
class EntrySmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-checked (no rows-only entries)") {
    // the differential gate is the correctness contract; a query without
    // an oracle silently downgrades to a rows>0 check
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without oracles: $unchecked")
  }

  test("all queries execute with rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfSmoke).count()
      if (n == 0) Some(name) else None
    }
    // c14's regex filter may legitimately match nothing at the smallest
    // scale; everything else must produce rows.
    assert(empty.filterNot(_ == "c14_rlike_filter").isEmpty,
      s"queries with 0 rows: $empty")
  }
}
