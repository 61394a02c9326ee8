package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sketches}

/** Unit coverage for the mergeable HLL distinct sketches and the
  * integer-exact weighted sampler (their oracle queries pin engine
  * parity; these pin the numeric contracts on controlled fixtures). */
class SketchSpec extends SparkTestBase {

  import spark.implicits._

  test("distinctSketch: estimate within 2% of a known cardinality") {
    // 10k distinct ids, each appearing twice — duplicates must not count
    val df = spark.range(0, 10000).select(col("id"))
      .union(spark.range(0, 10000).select(col("id")))
    val est = Sketches.distinctSketch(df, Seq(lit(1).as("g")), col("id"), 14)
      .select(col("estimate")).as[Long].head()
    assert(math.abs(est - 10000L) <= 200, s"estimate $est off by >2%")
  }

  test("rollupEstimate: union of disjoint bucket sketches matches direct") {
    val df = spark.range(0, 8000)
      .select(col("id"), (col("id") % 8).as("bucket"))
    val base = Sketches.distinctSketch(df, Seq(col("bucket")), col("id"), 14)
    val rolled = Sketches.rollupEstimate(base, Seq(lit(1).as("g")))
      .select(col("estimate")).as[Long].head()
    val direct = Sketches.distinctSketch(df, Seq(lit(1).as("g")), col("id"), 14)
      .select(col("estimate")).as[Long].head()
    assert(math.abs(rolled - direct) <= math.max(1L, direct / 100),
      s"rollup $rolled vs direct $direct diverge >1%")
  }

  test("sketch build combines map-side (shuffle carries sketches, not ids)") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 4).as("b"))
    val p = Sketches.distinctSketch(df, Seq(col("b")), col("id"), 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_hll_sketch_agg"),
      s"expected a partial sketch aggregate before the exchange:\n$p")
  }

  test("weightedSample: zero-weight rows never kept; heavy rows enriched") {
    val df = (0L until 4000L).map(i =>
      (i, if (i < 2000) 0L else if (i % 100 == 0) 50L else 1L))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(df, "doc_id", "w", expected = 400L)
    assert(kept.filter(col("w") === 0).count() == 0L)
    val n = kept.count()
    assert(n > 200 && n < 700, s"expected ≈400 rows, got $n")
    // inclusion probability scales with weight: the 50x rows' keep rate
    // must be well above the 1x rows'
    val heavyRate = kept.filter(col("w") === 50).count().toDouble / 20
    val lightRate = kept.filter(col("w") === 1).count().toDouble / 1980
    assert(heavyRate > 5 * lightRate,
      s"heavy $heavyRate not enriched over light $lightRate")
  }
}
