package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** Funnel, record-linkage and expectation-suite invariants the oracle
  * diff can't express: monotonicity, self-resolution, plan shape. */
class AnalyticsSpec extends SparkTestBase {

  test("funnel: step counts monotonically non-increasing, entry avg is 0") {
    val rows = SparkEntry.queries("funnel_steps")(spark, sfSmoke)
      .orderBy("step_idx").collect()
    assert(rows.length == 3)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"funnel must narrow: ${ns.mkString(",")}")
    assert(rows.head.getAs[Double]("avg_secs") == 0.0)
    assert(rows.forall(_.getAs[Double]("avg_secs") >= 0.0))
    // the conversion-windowed funnel can only lose users vs unbounded
    val windowed = SparkEntry.queries("funnel_windowed")(spark, sfSmoke)
      .orderBy("step_idx").collect().map(_.getAs[Long]("n_users"))
    assert(windowed.zip(ns).forall { case (w, unb) => w <= unb })
  }

  test("fuzzy linkage: every dirty record resolves to its true entity; no cartesian") {
    val df = SparkEntry.queries("link_fuzzy")(spark, sfSmoke)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"blocking degraded to cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop crept in:\n$p")
    val rows = df.collect()
    assert(rows.length == spark.read.parquet(s"$sfSmoke/customer.parquet").count())
    assert(rows.forall(r =>
      r.getAs[Long]("dirty_id") == r.getAs[Long]("matched_custkey")),
      "a dirty record resolved to the wrong customer")
    assert(rows.forall(_.getAs[Long]("dist") <= 1))
  }

  test("cohort retention: offset-0 retention is 1.0 and fractions never exceed it") {
    val rows = SparkEntry.queries("cohort_retention")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort"))
    byCohort.foreach { case (c, rs) =>
      val at0 = rs.find(_.getAs[Long]("offset") == 0L)
      assert(at0.isDefined, s"cohort $c missing offset 0")
      assert(at0.get.getAs[Double]("retention") == 1.0,
        s"cohort $c: day-0 retention must be 1.0 (every member is active the day they join)")
      assert(rs.forall(_.getAs[Double]("retention") <= 1.0))
    }
  }

  test("rolling z-score: one window pass, no history -> no score") {
    val df = SparkEntry.queries("ts_anomaly")(spark, sfSmoke)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"rolling stats must be a single window pass, not a self-join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // events 1..minObs per user can never be scored: the trailing
    // frame excludes the current row
    val total = queries.tbl(spark, sfSmoke, "events").count()
    assert(rows.length < total)
    assert(rows.forall(r => !r.getAs[Double]("z").isNaN))
  }

  test("salted aggregate: parity with the direct plan; salt spreads the partial") {
    val direct = queries.tbl(spark, sfSmoke, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SparkEntry.queries("agg_salted")(spark, sfSmoke)
    val p = salted.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2,
      s"two-phase salting needs a (key,salt) exchange then a key exchange:\n$p")
    val got = salted.collect().map(r =>
      r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_supp")).toMap
    assert(got == direct, s"salted rewrite changed results: $got vs $direct")
  }

  test("skew report: top-k via TakeOrdered, not a global sort") {
    val df = SparkEntry.queries("skew_report")(spark, sfSmoke)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must be a heap take, not a full sort:\n$p")
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    assert(rows.forall(_.getAs[Double]("x_mean") > 0.0))
  }

  test("A/B readout: balanced deterministic arms, finite t statistics") {
    val rows = SparkEntry.queries("ab_ttest")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na > 0 && nb > 0, "both arms must be populated")
      // hash split is ~50/50; allow wide slack on the small fixture
      assert(na.toDouble / (na + nb) > 0.2 && na.toDouble / (na + nb) < 0.8)
      val t = r.getAs[Double]("t_stat")
      assert(!t.isNaN && !t.isInfinite)
    }
    // same hash, same arms, same numbers on re-evaluation
    val again = SparkEntry.queries("ab_ttest")(spark, sfSmoke).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("path transitions: per-source probabilities sum to one") {
    val rows = SparkEntry.queries("path_transitions")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => {
      val p = r.getAs[Double]("p"); p > 0.0 && p <= 1.0
    }))
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 0.001, s"$src out-probabilities sum to $total")
    }
  }

  test("leakproof split: no near-dup cluster spans two splits") {
    val df = SparkEntry.queries("split_leakproof")(spark, sfSmoke)
    // same pair graph as the query (threshold mirrors DedupQueries)
    val emb = queries.tbl(spark, sfSmoke, "embeddings")
    val pairs = operators.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.45)
    val clusters = operators.Dedup.duplicateClusters(pairs)
      .withColumnRenamed("id", "vec_id")
    val spanning = df.join(clusters, Seq("vec_id"))
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(spanning == 0, s"$spanning near-dup clusters leak across splits")
    assert(df.select("split").distinct().count() == 3,
      "all three splits must be populated")
  }

  test("expectations: whole suite evaluates in one scan; verdicts react to data") {
    val orders = queries.tbl(spark, sfSmoke, "orders")
    val df = Expectations.run(orders, Seq(
      Expectation("size_pos", count(lit(1)), _ > 0),
      Expectation("impossible_negative_size", count(lit(1)), _ < 0),
      Expectation("completeness_custkey",
        Expectations.completeness(col("o_custkey")), _ === 1.0)))
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expectation suite must cost one scan, saw $scans:\n$p")
    val byName = df.collect().map(r =>
      r.getAs[String]("check_name") -> r.getAs[Boolean]("passed")).toMap
    assert(byName("size_pos") && byName("completeness_custkey"))
    assert(!byName("impossible_negative_size"),
      "a false check must produce passed=false")
  }

  test("referential: SQL FK null semantics, orphan count and coverage") {
    import spark.implicits._
    val child = Seq(Tuple1(Option(1)), Tuple1(Option(2)),
      Tuple1(None: Option[Int])).toDF("k")
    val parent = Seq(Tuple1(1)).toDF("pk")
    val r = Expectations.referential(child, parent, col("k"), col("pk"))
      .as[(Long, Long, Double)].head()
    assert(r === ((3L, 1L, math.floor(2.0 / 3 * 10000 + 0.5) / 10000)))
    val strict = Expectations.referential(child, parent, col("k"), col("pk"),
      nullIsOrphan = true).as[(Long, Long, Double)].head()
    assert(strict._2 === 2L, "null keys count as orphans only when asked")
  }

  test("trimmedMean: band drops the outlier tails; ties and nulls handled") {
    import spark.implicits._
    import graft.operators.Profiling
    // group a: 1..10 plus a 1000.0 outlier; 10% trim drops exactly the
    // min and the max occurrence -> mean(2..10) = 6.0
    val a = (1 to 10).map(v => ("a", Option(v.toDouble))) :+
      (("a", Option(1000.0))) :+ (("a", None: Option[Double]))
    // group b: all-tied values — band lands inside the tie, mean = tie
    val b = (1 to 10).map(_ => ("b", Option(7.5)))
    val out = Profiling.trimmedMean((a ++ b).toDF("g", "v"),
        col("g"), col("v"), trimPct = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((11L, 9L, 6.0)), s"group a: ${out("a")}")
    assert(out("b") == ((10L, 8L, 7.5)), s"group b: ${out("b")}")
    // 0% trim is the plain mean
    val plain = Profiling.trimmedMean(a.toDF("g", "v"),
        col("g"), col("v"), trimPct = 0)
      .collect().head.getDouble(3)
    assert(math.abs(plain - (55.0 + 1000.0) / 11.0) < 1e-9, s"plain: $plain")
  }

  test("chi2Independence: independent table zeros, perfect association n") {
    import spark.implicits._
    import graft.operators.Experiments
    // exactly independent 2x2 (margins 10/10 x 10/10, cells all 5):
    // every expected equals observed -> all contributions 0
    val ind = Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("x", "v")) ++
      Seq.fill(5)(("y", "u")) ++ Seq.fill(5)(("y", "v"))
    val ci = Experiments.chi2Independence(ind.toDF("a", "b"),
        col("a"), col("b")).collect()
    assert(ci.length == 4 && ci.forall(_.getDouble(4) == 0.0),
      s"independent table must contribute zero: ${ci.mkString(";")}")
    // perfect association (diagonal only): chi2 = n = 8 and expected
    // sums to n/2 per observed cell group
    val diag = Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("y", "v"))
    val cd = Experiments.chi2Independence(diag.toDF("a", "b"),
        col("a"), col("b")).collect()
    assert(cd.length == 2 && math.abs(cd.map(_.getDouble(4)).sum - 4.0) < 1e-9,
      s"diagonal observed cells carry chi2 = 2+2: ${cd.mkString(";")}")
  }

  test("ksTest: identical samples 0, disjoint 1, known half-shift exact") {
    import spark.implicits._
    import graft.operators.Experiments
    def ks(rows: Seq[(String, Double)]): (Long, Long, Long, Double) = {
      val r = Experiments.ksTest(rows.toDF("g", "v"),
        col("g"), col("v"), "A", "B").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    val same = (1 to 8).flatMap(i =>
      Seq(("A", i.toDouble), ("B", i.toDouble)))
    assert(ks(same) == ((8L, 8L, 0L, 0.0)), "identical CDFs never separate")
    val disjoint = (1 to 5).map(i => ("A", i.toDouble)) ++
      (11 to 15).map(i => ("B", i.toDouble))
    assert(ks(disjoint) == ((5L, 5L, 25L, 1.0)), "disjoint supports: D = 1")
    // A = {1..4}, B = {3..6}: max gap at v=2 -> |2*4 - 0*4| = 8, ks = 0.5
    val shifted = (1 to 4).map(i => ("A", i.toDouble)) ++
      (3 to 6).map(i => ("B", i.toDouble))
    assert(ks(shifted) == ((4L, 4L, 8L, 0.5)), s"half overlap: ${ks(shifted)}")
    // off-domain groups are ignored entirely
    assert(ks(same ++ Seq(("C", 999.0))) == ((8L, 8L, 0L, 0.0)))
    // past the exact-integer bound the plan fails LOUDLY (injected
    // tiny bound stands in for n_a*n_b >= 2^63) instead of quietly
    // wrapping the Long numerator
    val ex = intercept[Exception] {
      Experiments.ksTest(shifted.toDF("g", "v"), col("g"), col("v"),
        "A", "B", overflowBound = 16.0).collect()
    }
    assert(ex.getMessage.contains("exceeds the exact-integer bound") ||
      Option(ex.getCause).exists(_.getMessage
        .contains("exceeds the exact-integer bound")),
      s"expected the overflow guard, got: $ex")
  }

  test("MAD: robust to the outlier that poisons stddev; lower-median ties") {
    import spark.implicits._
    import graft.operators.Profiling
    // 1..9 plus a 1e6 outlier: median 5 (lower median of 10), devs
    // {4,3,2,1,0,1,2,3,4, 999995} -> sorted lower median 2 — the
    // outlier moves MAD not at all (stddev would explode)
    val a = ((1 to 9).map(v => ("a", v.toDouble)) :+ (("a", 1000000.0)))
    val out = Profiling.medianAbsDeviation(a.toDF("g", "v"),
        col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).head
    assert(out == (("a", 10L, 5.0, 2.0)), s"mad: $out")
    // all-equal group: MAD 0
    val b = Seq(("b", 3.33), ("b", 3.33), ("b", 3.33)).toDF("g", "v")
    val ob = Profiling.medianAbsDeviation(b, col("g"), col("v"))
      .collect().head
    assert(ob.getDouble(2) == 3.33 && ob.getDouble(3) == 0.0, s"tied: $ob")
  }

  test("benford: integer-exact digits, null/non-positive dropped, mass sums to n") {
    import spark.implicits._
    import graft.operators.Expectations
    // cents: 1999 -> '1', 2 -> '2', 2 -> '2', 999999 -> '9';
    // zero, negative and null rows must vanish
    val df = Seq(Option(19.99), Option(0.02), Option(0.02),
      Option(9999.99), Option(0.0), Option(-5.0), None).toDF("v")
    val rows = Expectations.benford(df,
        floor(col("v") * 100 + lit(0.5)))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet == (1 to 9).toSet, "one row per digit")
    assert(rows(1)._1 == 1L && rows(2)._1 == 2L && rows(9)._1 == 1L)
    assert(rows.values.map(_._1).sum == 4L, "only positive ints counted")
    // expected masses sum to n (the law's probabilities sum to 1)
    assert(math.abs(rows.values.map(_._2).sum - 4.0) < 1e-9)
    assert(rows.values.forall(_._3 >= 0.0), "chi contributions non-negative")
  }

  test("association rules: a-priori prune, both directions, basket guard") {
    import spark.implicits._
    val b = Seq(1 -> 1, 1 -> 2, 1 -> 3, 2 -> 1, 2 -> 2, 3 -> 1, 3 -> 2,
      3 -> 4, 4 -> 3, 4 -> 4, 5 -> 9, /* dup collapses: */ 2 -> 1)
      .toDF("bk", "it")
    val rules = graft.operators.Association
      .pairRules(b, "bk", "it", minSupport = 2L, k = 10)
      .collect()
      .map(r => (r.getAs[Int]("ante"), r.getAs[Int]("cons"),
        r.getAs[Long]("pair_n"), r.getAs[Long]("ante_n"),
        r.getAs[Long]("cons_n"), r.getAs[Double]("conf"),
        r.getAs[Double]("lift")))
    // only the (1,2) pair reaches support 2 (it appears in baskets
    // 1,2,3); singleton item 9 and all support-1 pairs are pruned
    assert(rules.toSeq == Seq(
      (1, 2, 3L, 3L, 3L, 1.0, 3.0 * 5 / (3 * 3)),
      (2, 1, 3L, 3L, 3L, 1.0, 3.0 * 5 / (3 * 3))),
      s"unexpected rules: ${rules.mkString(";")}")
    // basket guard: cap 2 drops the 3-item baskets, killing the pair
    val guarded = graft.operators.Association
      .pairRules(b, "bk", "it", minSupport = 2L, k = 10, maxBasketItems = 2)
    assert(guarded.count() == 0L)
  }

  test("observed expectations piggyback on the consuming job and read back") {
    val docs = graft.core.Lakehouse.table(spark, sfSmoke, "documents")
    val obs = new org.apache.spark.sql.Observation("dq_obs")
    val checks = Seq(
      Expectation("text_complete", Expectations.completeness(col("text")),
        m => m >= 0.99),
      Expectation("rows", count(lit(1)).cast("double"), m => m > 0.0),
      Expectation("impossible", count(lit(1)).cast("double"), m => m < 0.0))
    val instrumented = Expectations.observed(docs, obs, checks)
    val n = instrumented.count() // the only action — metrics ride this job
    val v = Expectations.verdicts(obs.get, checks)
      .map { case (k, m, p) => k -> ((m, p)) }.toMap
    assert(v("rows") == ((n.toDouble, true)))
    assert(v("text_complete")._2)
    assert(!v("impossible")._2)
  }
}
