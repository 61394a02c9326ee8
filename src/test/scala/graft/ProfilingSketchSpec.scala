package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Bounds the one-pass sketch outlier report against the exact
  * median/MAD path on real data (lineitem prices — continuous-valued,
  * exactly the cardinality profile the exact counts-map percentile
  * struggles with at scale) and on a constructed degenerate group.
  *
  * KLL rank error at k=800 is ≈0.47% (1.65%·(200/k)^0.9, 99% conf.), so
  * the recovered median/MAD sit within a ±1%-rank window of the exact
  * values and the tail count within a few rank-epsilons of n. The
  * assertions below use 3·ε-grade slack, far tighter than the report's
  * decision use (flagging drifted/contaminated groups).
  */
class ProfilingSketchSpec extends SparkTestBase {

  import spark.implicits._

  test("sketch report tracks the exact median/MAD/outlier report") {
    val df = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val exact = Profiling.robustOutliers(df, col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profiling.robustOutliersSketch(
      df, col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet == exact.keySet)
    for ((g, a) <- approx) {
      val e = exact(g)
      val (eMed, eMad, eN, eOut) =
        (e.getDouble(1), e.getDouble(2), e.getLong(3), e.getLong(4))
      val (aMed, aMad, aN, aOut) =
        (a.getDouble(1), a.getDouble(2), a.getLong(3), a.getLong(4))
      assert(aN == eN, s"group $g: exact row count must be preserved")
      // value-space tolerance: a ±1.5% RANK window around the median of
      // a price distribution maps to a small relative value window
      assert(math.abs(aMed - eMed) <= 0.05 * eMad.max(1.0),
        s"group $g: sketch median $aMed vs exact $eMed (mad $eMad)")
      assert(math.abs(aMad - eMad) / eMad.max(1.0) <= 0.05,
        s"group $g: sketch MAD $aMad vs exact $eMad")
      // tail estimate: within 1.5% of the group size of the exact count
      assert(math.abs(aOut - eOut) <= (0.015 * eN).max(2.0),
        s"group $g: outlier estimate $aOut vs exact $eOut of $eN rows")
    }
  }

  test("zero-MAD degenerate group counts any deviation, like the exact path") {
    // >50% identical values → MAD 0; outliers = rows off the median
    val rows = Seq.fill(60)(("g", 5.0)) ++ Seq.tabulate(10)(i => ("g", 100.0 + i))
    val df = rows.toDF("grp", "v")
    val out = Profiling.robustOutliersSketch(df, col("grp"), col("v")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 0.0,
      "median 5, MAD 0 expected")
    assert(r.getLong(4) == 10, "the 10 non-median rows are all outliers")
  }

  test("monotone: a wider k flags no more outliers than a narrower k") {
    val df = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    def outliers(k: Double) = Profiling.robustOutliersSketch(
      df, col("l_returnflag"), col("l_quantity"), k = k)
      .agg(sum("n_outliers")).as[Long].head()
    assert(outliers(3.0) >= outliers(5.0),
      "tightening the cut must not reduce flagged rows")
  }

  test("sketch equi-depth histogram tracks the exact one on a continuous column") {
    // 200k all-distinct values: the exact path's worst case, the
    // sketch path's target
    val df = spark.range(0, 200000)
      .select((hash(col("id")).cast("double") / 1000).as("v"))
    val n = 200000L
    val got = Profiling.equiDepthHistogramSketch(df, col("v"), buckets = 8)
      .orderBy("bucket")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.length == 8)
    // equal-depth within twice the KLL rank-error budget (k=800 →
    // ~0.47% rank error; allow 2% of n per bucket to stay stable)
    for ((bucket, rows, lo, hi) <- got) {
      assert(math.abs(rows - n / 8.0) <= n * 0.02,
        s"bucket $bucket depth $rows strays from ${n / 8}")
      assert(lo <= hi, s"bucket $bucket bounds inverted")
    }
    // boundaries tile the value range monotonically
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3 + 1e-9, s"buckets ${a._1},${b._1} overlap")
    }
    assert(math.abs(got.map(_._2).sum - n) <= n * 0.02,
      "bucket depths must re-assemble ~n")
  }

  test("histogram-refined exact path is bit-identical to the counts-map path") {
    // distinctBudget = 0 forces refinedMedian; the default stays on
    // counts-map percentile for these cardinalities. Fixtures cover
    // odd/even n, heavy duplicates, a single-value group, nulls, a
    // negative range, and an all-null group.
    val fixtures = Seq(
      "real" -> spark.read.parquet(s"$sfSmoke/lineitem.parquet")
        .select(col("l_returnflag").as("grp"),
          col("l_extendedprice").as("v")),
      "edges" -> (
        Seq.tabulate(7)(i => ("odd", i.toDouble)) ++
          Seq.tabulate(8)(i => ("even", i * 2.0)) ++
          Seq.fill(10)(("dup", 3.0)) ++ Seq(("dup", 9.0), ("dup", -1.0)) ++
          Seq(("one", 42.0)) ++
          Seq(("neg", -50.0), ("neg", -2.5), ("neg", -0.25), ("neg", -2.5))
        ).toDF("grp", "v")
        .unionByName(Seq(("nulls", Some(1.0)), ("nulls", None),
          ("allnull", Option.empty[Double])).toDF("grp", "v")),
      "random" -> {
        val rng = new scala.util.Random(10)
        Seq.tabulate(4000)(i =>
          (s"g${i % 5}", math.floor(rng.nextDouble() * 400) / 8))
          .toDF("grp", "v")
      },
      // RAW doubles, no dyadic grid: even-count groups interpolate
      // between two arbitrary middle values, which is exactly where a
      // wrong interpolation spelling (lo + (hi−lo)·f instead of
      // percentile's (⌈p⌉−p)·lo + (p−⌊p⌋)·hi) diverges in the last
      // ulp for ~9% of pairs — the dyadic fixtures above dodge it
      "nondyadic" -> {
        val rng = new scala.util.Random(77)
        Seq.tabulate(4000)(i => (s"g${i % 4}", rng.nextDouble() * 1000))
          .toDF("grp", "v")
      })
    for ((name, df) <- fixtures) {
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(_.toSeq.toList).sortBy(_.toString).toList
      val viaMap = canon(
        Profiling.robustOutliers(df, col("grp"), col("v")).collect())
      val viaHist = canon(Profiling.robustOutliers(df, col("grp"), col("v"),
        distinctBudget = 0L).collect())
      assert(viaHist == viaMap, s"fixture $name: paths diverge")
    }
  }

  test("fused median+MAD agg is bit-identical to the windowed two-phase path") {
    // medianAbsDeviation's below-budget path answers BOTH integer
    // lower medians from ONE MedianMadAgg counts-map buffer;
    // distinctBudget = 0 forces the original two-phase distinct-value
    // window spelling. Same cent quantization, same half-total rule,
    // same /100 rescales — the comparison is exact equality on the
    // full rows, doubles included (all values sit on the cent grid,
    // so no NaN/-0.0 subtleties arise; the allnull group vanishes on
    // both paths).
    val fixtures = Seq(
      "real" -> spark.read.parquet(s"$sfSmoke/lineitem.parquet")
        .select(col("l_returnflag").as("grp"),
          col("l_extendedprice").as("v")),
      "edges" -> (
        Seq.tabulate(7)(i => ("odd", i.toDouble)) ++
          Seq.tabulate(8)(i => ("even", i * 2.0)) ++
          Seq.fill(10)(("dup", 3.0)) ++ Seq(("dup", 9.0), ("dup", -1.0)) ++
          Seq(("one", 42.0)) ++
          Seq(("neg", -50.0), ("neg", -2.55), ("neg", -0.25), ("neg", -2.55))
        ).toDF("grp", "v")
        .unionByName(Seq(("nulls", Some(1.0)), ("nulls", None),
          ("allnull", Option.empty[Double])).toDF("grp", "v")),
      "random" -> {
        val rng = new scala.util.Random(23)
        Seq.tabulate(5000)(i =>
          (s"g${i % 6}", math.floor(rng.nextDouble() * 40000 - 20000) / 100))
          .toDF("grp", "v")
      })
    for ((name, df) <- fixtures) {
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(_.toSeq.toList).sortBy(_.toString).toList
      val fused = canon(
        Profiling.medianAbsDeviation(df, col("grp"), col("v")).collect())
      val windowed = canon(Profiling.medianAbsDeviation(df, col("grp"),
        col("v"), distinctBudget = 0L).collect())
      assert(fused == windowed, s"fixture $name: paths diverge")
    }
  }

  test("fused MAD pass matches the two-agg percentile spelling, incl. NaN devs") {
    // The below-budget path answers MAD + outlier count from ONE
    // fused aggregation (MadOutliersAgg); this pins it against the
    // explicit percentile-then-count spelling it replaced, on
    // non-dyadic values plus a NaN-carrying group (NaN devs must
    // neither fragment the buffer — bits-keyed map — nor change the
    // percentile's NaN-greatest ordering).
    val rng = new scala.util.Random(5)
    val df = (Seq.tabulate(900)(i => (s"g${i % 3}", rng.nextDouble() * 100)) ++
      // NaN-MAJORITY group: median and MAD are themselves NaN
      Seq.fill(40)(("gn", Double.NaN)) ++
      Seq.tabulate(30)(i => ("gn", i * 1.5)) ++
      // NaN-MINORITY group: finite median/MAD, NaN deviations — the
      // one place the fused walk's comparison semantics are load-
      // bearing: under Spark SQL's `>` (NaN greatest) every NaN dev
      // exceeds the finite positive k·MAD fence and COUNTS as an
      // outlier; a JVM-primitive walk silently reports 0
      Seq.fill(5)(("gm", Double.NaN)) ++
      Seq.tabulate(45)(i => ("gm", i * 2.0)) ++
      // ±Infinity group: legitimate +Inf deviations arise from BOTH
      // sides of the median (−Inf on the left, +Inf on the right) —
      // the round-15 two-pointer dev merge must treat them as one
      // equal dev value, never as an exhausted-run sentinel
      Seq(("gi", Double.NegativeInfinity), ("gi", Double.PositiveInfinity)) ++
      Seq.tabulate(21)(i => ("gi", i * 3.0)) ++
      // overflow group: huge finite values whose |v − med| rounds to
      // +Inf within one run AND across runs
      Seq(("gb", -1.7e308), ("gb", -1.6e308), ("gb", 1.7e308)) ++
      Seq.tabulate(9)(i => ("gb", i * 1.0)) ++
      // signed-zero group: −0.0 sits just below +0.0 in the buffer's
      // total order but is primitively EQUAL to a 0.0 median — it must
      // stay on the left run with dev +0.0, matching abs()
      Seq(("gz", -0.0), ("gz", 0.0), ("gz", 0.0), ("gz", 1.0), ("gz", -1.0)) ++
      // Inf-MAJORITY median with NaNs (round-16 ADVICE #1): med = +Inf
      // passes the NaN early-return, every equal-to-med dev is
      // Inf − Inf = NaN while every other dev is +Inf — the sorted dev
      // multiset is the directly-built [+Inf, NaN]; the outward merge,
      // whose runs are monotone only about a FINITE center, emitted
      // the NaN devs first (unsorted, unmerged with the NaN-value
      // entry) and returned mad = +Inf, n_outliers = 4
      Seq(("gj", 1.0), ("gj", Double.PositiveInfinity),
        ("gj", Double.PositiveInfinity), ("gj", Double.NaN),
        ("gj", Double.NaN)) ++
      // −Inf median with a NaN tail: same direct construction, other
      // side of the number line (equal-to-med devs −Inf − (−Inf) = NaN)
      Seq.fill(3)(("gni", Double.NegativeInfinity)) ++
      Seq(("gni", 5.0), ("gni", Double.NaN)) ++
      // −0.0-MAJORITY group whose median is −0.0 (round-16 ADVICE #2):
      // bare med − v yields −0.0 for v = +0.0 where SQL's abs gives
      // +0.0 — the MAD must come back +0.0 BITS
      Seq(("gz2", -0.0), ("gz2", -0.0), ("gz2", 0.0), ("gz2", 0.0))
    ).toDF("grp", "v")
    val fused = Profiling.robustOutliers(df, col("grp"), col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq.toList).toMap
    val med = df.groupBy(col("grp"))
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val madDf = df.join(med, Seq("grp"))
      .withColumn("dev", abs(col("v") - col("med")))
      .groupBy(col("grp"), col("med"))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"),
        count(lit(1)).as("n_rows"))
    // the pre-fusion predicate VERBATIM (the above-budget refined
    // path still runs this SQL) — the fused n_outliers must match it
    // bit-for-bit, NaN devs included
    val twoAgg = df.join(madDf, Seq("grp"))
      .withColumn("dev", abs(col("v") - col("med")))
      .groupBy(col("grp"), col("med"), col("mad"), col("n_rows"))
      .agg(sum(when((col("mad") > 0 && col("dev") > col("mad") * 5.0) ||
        (col("mad") === 0 && col("dev") > 0), 1L).otherwise(0L))
        .as("n_outliers"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    def bitsEq(a: Any, b: Double): Boolean =
      java.lang.Double.doubleToLongBits(a.asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(b)
    for ((g, (m, mad, n, out)) <- twoAgg) {
      val f = fused(g)
      // bit equality, not ==: the NaN-dev group's median and MAD are
      // NaN on BOTH paths, and NaN == NaN is false. EXCEPTION, median
      // only: when the median ranks land where a -0.0 run meets a
      // +0.0 run (gz2), Spark's own percentile is nondeterministic in
      // the zero's SIGN (SQLOrderingUtil-equal keys, stable sort over
      // OpenHashMap iteration order — see interpolatedMedian's
      // scaladoc), so ±0.0 medians compare value-equal (primitive ==,
      // false for NaNs) with the deterministic fused choice pinned
      // separately below. The MAD stays strict bits everywhere: its
      // devs are abs'd on both paths and never carry a -0.0.
      val medOk = bitsEq(f(1), m) || f(1).asInstanceOf[Double] == m
      assert(medOk && bitsEq(f(2), mad) && f(3) == n && f(4) == out,
        s"group $g: fused $f vs two-agg ($m, $mad, $n, $out)")
    }
    // the minority-NaN group must actually exercise the NaN tail
    assert(twoAgg("gm")._4 == 5L,
      "fixture: gm's 5 NaN devs are outliers under SQL ordering")
    // the Inf-median fixtures must actually reach the non-finite-med
    // branch (med = ±Inf, mad = NaN, zero outliers) in the ORACLE too
    assert(twoAgg("gj")._1.isPosInfinity && twoAgg("gj")._2.isNaN &&
      twoAgg("gj")._4 == 0L, "fixture: gj has a +Inf median, NaN MAD")
    assert(twoAgg("gni")._1.isNegInfinity && twoAgg("gni")._2.isNaN &&
      twoAgg("gni")._4 == 0L, "fixture: gni has a -Inf median, NaN MAD")
    // the ±0.0-straddle fixture: the oracle's MAD is +0.0 BITS (its
    // devs go through abs) — the pair the abs'd left-run dev exists
    // for — and the fused path's deterministic choices are pinned:
    // median -0.0 bits (strict bits total order picks the low side of
    // the boundary; Spark's own zero-sign there is a hash-layout
    // artifact, compared value-equal above), MAD +0.0 bits
    assert(twoAgg("gz2")._1 == 0.0 &&
      java.lang.Double.doubleToLongBits(twoAgg("gz2")._2) == 0L,
      "fixture: gz2's median is a zero and its MAD is +0.0 bits")
    assert(java.lang.Double.doubleToLongBits(
        fused("gz2")(1).asInstanceOf[Double]) ==
      java.lang.Double.doubleToLongBits(-0.0) &&
      java.lang.Double.doubleToLongBits(
        fused("gz2")(2).asInstanceOf[Double]) == 0L,
      "fused: gz2 median pinned -0.0 bits, MAD pinned +0.0 bits")
  }

  test("SQL surface: kll_rank and kll_absdev_stats are registered") {
    org.apache.spark.sql.graftx.GraftExtensions.install(spark)
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").createOrReplaceTempView("kll_probe")
    val r = spark.sql(
      """SELECT kll_rank(sk, 2.0) AS rank_2,
                kll_absdev_stats(sk, kll_quantile(sk, 0.5), 2.0).mad AS mad
         FROM (SELECT kll_sketch_agg(v) AS sk FROM kll_probe)""").head()
    assert(r.getDouble(0) == 0.5, "rank of 2.0 in {1,2,3,4} is 0.5")
    assert(r.getDouble(1) >= 0.5 && r.getDouble(1) <= 1.5,
      "MAD of {1,2,3,4} about its median")
  }
}
