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

  test("quantileSketch: q50/q95 inside the exact rank band, with compaction") {
    // 100k skewed values — well past k=200, so the sketch actually
    // compacts and the rank-error bound (not exactness) is what holds
    val df = spark.range(0, 100000)
      .select((col("id") * col("id")).cast("double").as("v"))
    val q = Sketches.rollupQuantiles(
      Sketches.quantileSketch(df, Seq(lit(1).as("g")), col("v")),
      Seq(lit(1).as("g")), Seq(0.5, 0.95))
      .select(col("q50"), col("q95")).as[(Double, Double)].head()
    def exact(p: Double): Double =
      df.agg(percentile(col("v"), lit(p))).as[Double].head()
    // k=200: 99%-confidence rank error 1.65%; band ±0.05 is ~8 sigma
    assert(q._1 >= exact(0.45) && q._1 <= exact(0.55),
      s"q50 ${q._1} outside exact rank band [${exact(0.45)}, ${exact(0.55)}]")
    assert(q._2 >= exact(0.90) && q._2 <= exact(0.99),
      s"q95 ${q._2} outside exact rank band")
  }

  test("quantileSketch rollup from fine buckets matches the rank band too") {
    val df = spark.range(0, 50000)
      .select(col("id").cast("double").as("v"), (col("id") % 16).as("b"))
    val merged = Sketches.rollupQuantiles(
      Sketches.quantileSketch(df, Seq(col("b")), col("v")),
      Seq(lit(1).as("g")), Seq(0.5))
      .select(col("q50")).as[Double].head()
    assert(merged >= 0.45 * 50000 && merged <= 0.55 * 50000,
      s"merged q50 $merged outside the exact rank band")
  }

  test("KLL aggregates coerce/reject input types at analysis time") {
    // integer input: implicitly cast to double (was a runtime
    // ClassCastException before ExpectsInputTypes)
    val intQ = Sketches.rollupQuantiles(
      Sketches.quantileSketch(spark.range(0, 1000).toDF("v"),
        Seq(lit(1).as("g")), col("v")),
      Seq(lit(1).as("g")), Seq(0.5)).select(col("q50")).as[Double].head()
    assert(intQ >= 400 && intQ <= 600, s"int-typed q50 $intQ off")
    // union over a non-binary column must fail analysis, not execution
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(0, 10).toDF("v")
        .agg(org.apache.spark.sql.graftx.KllSketch.unionAgg(col("v"), 200))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
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

  test("freq sketch cube: heavy hitters survive purging, rollup, and reshuffling") {
    import graft.operators.Sketches
    // 2 hot items (~25% each) + 5000 cold singletons-ish, far beyond
    // maxMapSize=64 so the sketch genuinely purges
    val rows = (0L until 20000L).map { i =>
      val item = if (i % 4 == 0) "hotA" else if (i % 4 == 1) "hotB" else s"cold_${i % 5003}"
      (if (i % 2 == 0) "x" else "y", item)
    }
    val df = rows.toDF("bucket", "item")
    def hitters(input: org.apache.spark.sql.DataFrame): Seq[String] = {
      val perBucket = Sketches.freqSketch(input, Seq(col("bucket")), col("item"), 64)
      Sketches.rollupHeavyHitters(perBucket, Seq.empty, minFraction = 0.125, 64)
        .select(explode(col("heavy")).as("item")).as[String].collect().toSeq
    }
    assert(hitters(df) == Seq("hotA", "hotB"))
    // merge-order insensitivity of the SET: different physical layout
    assert(hitters(df.repartition(17)) == Seq("hotA", "hotB"))
  }

  test("freq sketch streamLength counts every merged row") {
    import org.apache.spark.sql.graftx.FreqSketch
    val df = (0L until 1000L).map(i => s"i${i % 7}").toDF("item")
    val n = df.agg(FreqSketch.streamLength(
      FreqSketch.sketchAgg(col("item"), 32)).as("n")).as[Long].head()
    assert(n == 1000L)
  }

  test("perKeyCap: ≤cap per key, salted two-phase equals single-window answer") {
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "hot" else s"k${i % 10}")).toDF("doc_id", "source")
    val capped = Sampling.perKeyCap(df, "source", "doc_id", cap = 25, salts = 8)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ <= 25), s"cap exceeded: $byKey")
    assert(byKey("hot") == 25) // 1000 rows in the hot key → exactly cap survive
    // two-phase == single-window (salts = 1 is the unsalted plan)
    val exact = Sampling.perKeyCap(df, "source", "doc_id", cap = 25, salts = 1)
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty)
    // determinism under repartition: the kept SET is partition-insensitive
    val reshuffled = Sampling.perKeyCap(df.repartition(13), "source", "doc_id", 25, 8)
    assert(capped.exceptAll(reshuffled).isEmpty && reshuffled.exceptAll(capped).isEmpty)
  }

  test("perKeyCap keeps everything when a key is under its cap") {
    val df = (0L until 40L).map(i => (i, s"k${i % 4}")).toDF("doc_id", "source")
    assert(Sampling.perKeyCap(df, "source", "doc_id", cap = 100).count() == 40L)
  }

  test("weightedSample fails loudly past the exact-integer bound") {
    // sum(weight) > Long.Max/10^4 used to wrap silently and corrupt the
    // keep set; the in-plan guard must raise instead
    val big = Long.MaxValue / 10000L
    val df = Seq((1L, big), (2L, big)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "doc_id", "w", expected = 10L).count()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("overflow"), s"unexpected error: $messages")
  }
}
