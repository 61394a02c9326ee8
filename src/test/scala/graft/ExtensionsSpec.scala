package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the codegen expressions must be reachable from raw
  * SQL once the extension is installed. Separate session builder (the
  * extension hooks in at session construction). */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return a session built by another suite in this
  // JVM (where withExtensions can no longer apply) — cover both paths:
  // builder-time extension when we own the session, post-hoc install
  // otherwise.
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .getOrCreate()
    org.apache.spark.sql.graftx.GraftExtensions.install(s)
    s
  }

  test("sorted_intersect_size is callable from SQL") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
  }

  test("numeric_array_dot is callable from SQL") {
    val d = spark.sql(
      "SELECT numeric_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
  }

  test("kll sketch cube is buildable from raw SQL") {
    val q50 = spark.sql(
      """WITH base AS (SELECT id % 4 AS b, CAST(id AS DOUBLE) AS v FROM range(0, 1000)),
         cube AS (SELECT b, kll_sketch_agg(v, 200) AS s FROM base GROUP BY b)
         SELECT kll_quantile(kll_union_agg(s, 200), 0.5D) AS q50 FROM cube""")
      .collect().head.getDouble(0)
    assert(q50 > 400 && q50 < 600, s"median of 0..999 ≈ 500, got $q50")
  }

  test("frequent-items cube is buildable from raw SQL") {
    val items = spark.sql(
      """WITH base AS (
           SELECT CASE WHEN id % 3 = 0 THEN 'hot' ELSE concat('c', id) END AS item,
                  id % 2 AS b
           FROM range(0, 3000)),
         cube AS (SELECT b, freq_sketch_agg(item, 32) AS s FROM base GROUP BY b),
         m AS (SELECT freq_union_agg(s, 32) AS ms FROM cube)
         SELECT freq_heavy_hitters(ms, CAST(freq_stream_length(ms) / 10 AS BIGINT)) AS hh
         FROM m""")
      .collect().head.getSeq[String](0)
    assert(items == Seq("hot"))
  }

  test("might_contain pairs with the built-in bloom_filter_agg in SQL") {
    val rows = spark.sql(
      """WITH f AS (SELECT bloom_filter_agg(xxhash64(x), 8L, 64L) AS bf
                    FROM VALUES ('alpha'), ('beta') t(x))
         SELECT x, might_contain((SELECT bf FROM f), xxhash64(x)) AS hit
         FROM VALUES ('alpha'), ('beta'), ('missing-gram-zzz') t(x)""")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("alpha") && rows("beta"), "no false negatives")
    // 64-bit sketch over 2 items: the miss probe is overwhelmingly
    // likely false, but only no-false-negatives is guaranteed — don't
    // assert on it.
  }
}
