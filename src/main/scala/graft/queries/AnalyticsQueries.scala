package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Cohorts, Expectations, Experiments, Funnel, Paths, RecordLinkage, Relational, Sketches, Skew, TimeSeries}
import graft.operators.Expectations.Expectation

/** Event/entity analytics beyond the reference's own surface: ordered
  * funnels, fuzzy record linkage, and declarative data-quality
  * expectation suites — each differentially oracle-checked.
  */
object AnalyticsQueries {

  val queries: Map[String, QueryFn] = Map(

    // Strict ordered funnel view -> click -> purchase over the event
    // log: per-step user counts + mean seconds from funnel entry.
    "funnel_steps" -> ((s, d) => {
      Funnel.steps(tbl(s, d, "events"), "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"))
    }),

    // Fuzzy record linkage: customer names deterministically corrupted
    // (digit substitution / interior deletion / untouched, by key mod 3;
    // both edit sites sit in the always-'0' digit prefix so the true
    // match is unambiguous at any scale factor) are linked back to the
    // clean roster via two SELECTIVE blocking passes — 4-char suffix
    // (primary) and 3-char suffix (backstop) — + thresholded
    // Levenshtein verify + best-match resolution. Suffix keys survive
    // any edit left of the suffix; with block-key cardinality B the
    // candidate space is |corpus|²/B, and the suffix length is the
    // selectivity dial (B = 10^4/10^3 here vs B = 10 for the rejected
    // prefix key — the skew_report anti-pattern, 1000x more pairs plus
    // a flood of spurious distance-1 cross-entity matches; measured in
    // ScaleProbe linkage5). Every dirty record must resolve to
    // its true customer; `n_candidates` > 1 marks the ambiguous ones a
    // real pipeline would route to review.
    "link_fuzzy" -> ((s, d) => {
      val clean = tbl(s, d, "customer").select(col("c_custkey"), col("c_name"))
      val dirty = clean.select(
        col("c_custkey").as("dirty_id"),
        when(col("c_custkey") % 3 === 0,
          concat(substring(col("c_name"), 1, 9), lit("X"),
            substring(col("c_name"), 11, 8)))
          .when(col("c_custkey") % 3 === 1,
            concat(substring(col("c_name"), 1, 10),
              substring(col("c_name"), 12, 7)))
          .otherwise(col("c_name")).as("dirty_name"))
      val cands = RecordLinkage.candidates(dirty, clean,
        col("dirty_name"), col("c_name"),
        blockKeys = Seq(
          (substring(col("dirty_name"), -4, 4), substring(col("c_name"), -4, 4)),
          (substring(col("dirty_name"), -3, 3), substring(col("c_name"), -3, 3))),
        maxDist = 1)
      RecordLinkage.bestMatch(cands, col("dirty_id"), Seq(col("c_custkey")))
        .select(col("dirty_id"), col("dirty_name"),
          col("c_custkey").as("matched_custkey"), col("c_name").as("matched_name"),
          col("dist").cast("bigint").as("dist"), col("n_candidates"))
    }),

    // Declarative quality suite over orders, one aggregation pass:
    // size, completeness, key uniqueness, bounds, value-set
    // conformance, categorical cardinality.
    "dq_expectations" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      Expectations.run(o, Seq(
        Expectation("size_min", count(lit(1)), _ >= 1000),
        Expectation("completeness_custkey",
          Expectations.completeness(col("o_custkey")), _ === 1.0),
        Expectation("uniqueness_orderkey",
          Expectations.uniqueness(col("o_orderkey")), _ === 1.0),
        Expectation("totalprice_min_nonneg", min(col("o_totalprice")), _ >= 0.0),
        Expectation("totalprice_max_bound", max(col("o_totalprice")), _ <= 1000000.0),
        Expectation("status_in_set",
          Expectations.inSet(col("o_orderstatus"), Seq("O", "F", "P")), _ === 1.0),
        Expectation("priority_cardinality",
          countDistinct(col("o_orderpriority")).cast("double"), _ <= 10.0)))
        .select(col("check_name"), round4(col("metric")).as("metric"),
          col("passed"))
    }),

    // Daily cohort retention with purchases as the activity signal:
    // cohort = day of a user's first purchase; each (cohort, offset)
    // row reports how much of the cohort was still purchasing N days
    // later.
    "cohort_retention" -> ((s, d) => {
      Cohorts.retention(tbl(s, d, "events"), "user_id", "ts_us",
        periodUs = 86400000000L, activity = col("event_type") === "purchase")
    }),

    // Trailing z-score anomaly flags per user: each event's value
    // against that user's previous-8-events mean/deviation (raw-moment
    // formulation; rounded score, verdict computed on the rounded
    // value so the flag is engine-reproducible).
    "ts_anomaly" -> ((s, d) => {
      val scored = TimeSeries.rollingZScore(tbl(s, d, "events"),
        partitionCols = Seq(col("user_id")),
        orderCols = Seq(col("ts_us"), col("event_id")),
        valueCol = col("value"), lookback = 8, minObs = 4)
      scored.select(col("event_id"), col("user_id"),
          round2(col("z")).as("z"))
        .withColumn("is_anomaly", abs(col("z")) > 2.0)
    }),

    // The same funnel with a 7-day conversion window from entry —
    // "converted within N days", the refinement every growth dashboard
    // ships next to the unbounded funnel.
    "funnel_windowed" -> ((s, d) => {
      Funnel.steps(tbl(s, d, "events"), "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"),
        windowUs = Some(7L * 86400000000L))
    }),

    // Per-event session assignment (gaps-and-islands detail view —
    // stream_sessionize reports per-session rollups; this emits the
    // event -> session mapping): one window pass, exact integer
    // micros, 30-minute gap.
    "session_assign" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val newSession = when(
        lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) >= 1800000000L, 1L)
        .otherwise(0L)
      tbl(s, d, "events")
        .withColumn("__ns", newSession)
        .withColumn("session_idx", sum(col("__ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("session_idx"))
    }),

    // A/B readout: deterministic 50/50 md5-hash arm assignment on
    // user_id, then Welch's t per event_type from one pass of
    // count/sum/sum-of-squares partials.
    "ab_ttest" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      Experiments.welchTTest(ev, col("event_type"),
          Experiments.armOf(col("user_id")), col("value"))
        .select(col("key").as("event_type"), col("n_a"), col("n_b"),
          round4(col("mean_a")).as("mean_a"),
          round4(col("mean_b")).as("mean_b"),
          round4(col("t_stat")).as("t_stat"))
    }),

    // First-order event transition matrix (path/flow analysis): one
    // lead() window pass, vocabulary-sized output, per-source
    // normalized probabilities.
    "path_transitions" -> ((s, d) => {
      Paths.transitions(tbl(s, d, "events"),
        partitionCols = Seq(col("user_id")),
        orderCols = Seq(col("ts_us"), col("event_id")),
        stateCol = col("event_type"))
    }),

    // Two-phase salted aggregation parity: exact count-distinct
    // (salted on the DISTINCT column's hash so buckets partition the
    // value space and per-bucket counts sum exactly) + a sum, per hot
    // group. The oracle pins that the rewrite is semantics-preserving.
    "agg_salted" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      Skew.saltedAggregate(li, Seq("l_returnflag"),
        saltCol = pmod(hash(col("l_suppkey")), lit(16)),
        phase1 = Seq(countDistinct(col("l_suppkey")).as("__nd"),
          sum(col("l_quantity")).as("__sq")),
        phase2 = Seq(sum(col("__nd")).as("n_supp"),
          round2(sum(col("__sq"))).as("sum_qty")))
    }),

    // Key-skew diagnosis: top-10 heaviest l_partkey values with corpus
    // share and multiple-of-mean — the pre-join report that decides
    // whether a key needs salting/AQE skew handling.
    "skew_report" -> ((s, d) => {
      Skew.report(tbl(s, d, "lineitem"), col("l_partkey"), k = 10)
    }),

    // Calendar resample + forward fill: per-user daily buckets between
    // first and last observation, gaps carrying the last observed
    // value — the regular-spacing normalization before rolling stats.
    "ts_resample" -> ((s, d) => {
      TimeSeries.resampleFill(tbl(s, d, "events"), "user_id", "ts_us",
        "value", "event_id", bucketUs = 86400000000L)
    }),

    // Mergeable-sketch distinct cube: daily HLL sketches of the
    // ordering customer, rolled up to months, must (a) estimate within
    // 5% of the exact distinct count and (b) agree with a directly
    // built month sketch to 1% — the pre-aggregated-cube contract that
    // answers "distinct per X" at 100 TB from sketch unions alone,
    // never rescanning raw data. The oracle pins the exact counts and
    // asserts both accuracy flags as ground truth, so a sketch
    // regression breaks the hash.
    "sketch_distinct" -> ((s, d) => {
      val orders = tbl(s, d, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("o_day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      val daily = Sketches.distinctSketch(orders,
        Seq(col("o_month"), col("o_day")), col("o_custkey"), lgK = 14)
      val rolled = Sketches.rollupEstimate(daily, Seq(col("o_month")))
        .withColumnRenamed("estimate", "__est_merged")
      val direct = Sketches.distinctSketch(orders, Seq(col("o_month")),
          col("o_custkey"), lgK = 14)
        .select(col("o_month"), col("estimate").as("__est_direct"))
      val exact = orders.groupBy(col("o_month"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      exact.join(rolled, Seq("o_month")).join(direct, Seq("o_month"))
        .select(col("o_month"), col("n_exact"),
          (abs(col("__est_direct") - col("n_exact")) <=
            col("n_exact").cast("double") * 0.05).as("sketch_ok"),
          (abs(col("__est_merged") - col("__est_direct")) <=
            col("__est_direct").cast("double") * 0.01).as("merge_ok"))
    }),

    // Mergeable-sketch QUANTILE cube (KLL): daily sketches of the order
    // total, rolled up to months, must land within the exact rank band
    // p50±0.05 (k=200's 99%-confidence rank error is 1.65%, so 0.05 is
    // ~8σ) — both the direct month sketch and the one merged from
    // dailies. percentile_approx can't back this cube (its state is not
    // persistable/re-mergeable); the serialized KLL sketch is. The
    // oracle pins the exact month row counts and asserts the accuracy
    // flags as ground truth.
    // Per-user event-stream gap audit: one lag() pass, rows where
    // consecutive events are >36h apart (sensor-dropout detection).
    "ts_gaps" -> ((s, d) => {
      TimeSeries.gaps(tbl(s, d, "events"), col("user_id"), col("ts_us"),
        thresholdUs = 36L * 3600 * 1000000)
        .select(col("key").as("user_id"), col("gap_start_us"),
          col("gap_end_us"), col("gap_us"))
    }),

    // Event debounce: drop (user, type) repeats arriving within 6h of
    // their predecessor — the double-submit/at-least-once-replay
    // cleaner. One lag pass, O(1) state per task.
    "ts_debounce" -> ((s, d) => {
      TimeSeries.debounce(tbl(s, d, "events"),
        Seq(col("user_id"), col("event_type")), col("ts_us"),
        col("event_id"), windowUs = 6L * 3600 * 1000000)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
    }),

    // Robust per-group outlier report (median/MAD, 50% breakdown
    // point): medians are EXACT counts-map percentiles, k=5 fence.
    "dq_outliers" -> ((s, d) => {
      graft.operators.Profiling.robustOutliers(
        tbl(s, d, "lineitem"), col("l_returnflag"), col("l_extendedprice"))
        .select(col("grp").as("l_returnflag"),
          round4(col("med")).as("med"), round4(col("mad")).as("mad"),
          col("n_rows"), col("n_outliers"))
    }),

    // The SAME robust report through the ABOVE-budget branch of the
    // adaptive split: distinctBudget = 0 forces the histogram-refined
    // windowed path (refinedMedian — bounded HistBins state per corpus
    // pass), the plan a >2M-distinct continuous column takes at the
    // 100 TB shape, where the fused counts-map above would hold one
    // buffer entry per distinct double and die. Gating it separately
    // puts BOTH branches of the split behind a DuckDB hash-match row
    // (dq_outliers = fused below-budget, this = windowed above-budget);
    // the branches are bit-identical by ProfilingSketchSpec's pins, so
    // the oracle SQL is shared verbatim.
    "dq_outliers_refined" -> ((s, d) => {
      graft.operators.Profiling.robustOutliers(
        tbl(s, d, "lineitem"), col("l_returnflag"), col("l_extendedprice"),
        distinctBudget = 0L)
        .select(col("grp").as("l_returnflag"),
          round4(col("med")).as("med"), round4(col("mad")).as("mad"),
          col("n_rows"), col("n_outliers"))
    }),

    // Frequent-items cube: per-returnflag heavy-hitter sketches rolled
    // up globally; output = items whose frequency LOWER bound clears
    // 1/8 of the stream (NO_FALSE_POSITIVES). The stream is synthesized
    // skewed (3 hot items ≈1/6 each, ~30k cold items ≪ threshold) so
    // the guaranteed-in/guaranteed-out bands leave no ambiguity and the
    // set matches exact SQL under any merge order.
    "sketch_topk" -> ((s, d) => {
      val li = tbl(s, d, "lineitem").select(col("l_returnflag").as("bucket"),
        when(pmod(col("l_orderkey"), lit(2)) === 0,
          concat(lit("hot_"), pmod(col("l_orderkey"), lit(3)).cast("string")))
          .otherwise(concat(lit("cold_"),
            pmod(col("l_orderkey"), lit(30011)).cast("string"))).as("item"))
      val perBucket = Sketches.freqSketch(li, Seq(col("bucket")), col("item"),
        maxMapSize = 128)
      Sketches.rollupHeavyHitters(perBucket, Seq.empty, minFraction = 0.125,
        maxMapSize = 128)
        .select(explode(col("heavy")).as("item"))
    }),

    "sketch_quantile" -> ((s, d) => {
      val orders = tbl(s, d, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("o_day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      val daily = Sketches.quantileSketch(orders,
        Seq(col("o_month"), col("o_day")), col("o_totalprice"))
      val rolled = Sketches.rollupQuantiles(daily, Seq(col("o_month")), Seq(0.5))
        .withColumnRenamed("q50", "__q50_merged")
      val direct = Sketches.rollupQuantiles(
        Sketches.quantileSketch(orders, Seq(col("o_month")), col("o_totalprice")),
        Seq(col("o_month")), Seq(0.5))
        .withColumnRenamed("q50", "__q50_direct")
      // Band endpoints are ORDER STATISTICS (ranks ceil(0.45n) and
      // ceil(0.55n)), matching KLL's INCLUSIVE quantile semantics —
      // an interpolating percentile() band excludes both data values
      // on a 2-row month. collect_list is per-month-sized (a verify
      // harness, not a production path).
      val exact = orders.groupBy(col("o_month"))
        .agg(count(lit(1)).as("n_rows"),
          sort_array(collect_list(col("o_totalprice"))).as("__vals"))
        .select(col("o_month"), col("n_rows"),
          element_at(col("__vals"),
            greatest(ceil(col("n_rows") * 0.45), lit(1)).cast("int")).as("__lo"),
          element_at(col("__vals"),
            least(ceil(col("n_rows") * 0.55), col("n_rows")).cast("int")).as("__hi"))
      exact.join(rolled, Seq("o_month")).join(direct, Seq("o_month"))
        .select(col("o_month"), col("n_rows"),
          col("__q50_direct").between(col("__lo"), col("__hi")).as("sketch_ok"),
          col("__q50_merged").between(col("__lo"), col("__hi")).as("merge_ok"))
    }),

    // Cross-table referential integrity (the DQ dimension the
    // single-table suite can't express): orders whose customer is
    // missing from a deliberately punctured dimension — orphan count +
    // coverage in one left-anti-shaped pass.
    "dq_referential" -> ((s, d) => {
      Expectations.referential(
        tbl(s, d, "orders"),
        tbl(s, d, "customer").filter(col("c_custkey") % 3 =!= 0),
        col("o_custkey"), col("c_custkey"))
    }),

    // Exact equi-depth histogram of the length distribution: 8
    // equal-count bins with bounds, from ONE corpus scan over the
    // distinct-value table (Profiling.equiDepthHistogram — no ntile
    // single-partition sort).
    "hist_equidepth" -> ((s, d) => {
      graft.operators.Profiling.equiDepthHistogram(
        tbl(s, d, "documents"), col("n_chars"), buckets = 8)
    }),

    // Error-bounded approximate aggregation: Horvitz-Thompson group
    // totals + standard errors from the deterministic 2% hash sample —
    // profile the fact table from the fraction the sample touches
    // (Sampling.aqpGroupSum).
    "aqp_group_sum" -> ((s, d) => {
      graft.operators.Sampling.aqpGroupSum(tbl(s, d, "lineitem"),
        col("l_orderkey") * 10 + col("l_linenumber"),
        col("l_returnflag"), col("l_extendedprice"), rate = 0.02)
    }),

    // Exact per-group weighted median (quantity-weighted median price —
    // the token-weighted median-length readout shape): the distinct-
    // value decomposition again, with the half-total comparison in
    // integer arithmetic (2·cum ≥ W) so ties are engine-exact
    // (Profiling.weightedMedian).
    "weighted_median" -> ((s, d) => {
      graft.operators.Profiling.weightedMedian(tbl(s, d, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    }),

    // Benford first-digit screen over the price column: organic
    // multi-scale magnitudes follow log10(1+1/d); fabricated or
    // synthetic numeric tables usually don't — the per-digit
    // chi-square decomposition is the machine-generated-data detector
    // of the DQ tier. Digits come from the exact integer's decimal
    // rendering (never float formatting); the law's masses are shared
    // decimal literals — bit-exact (Expectations.benford).
    "dq_benford" -> ((s, d) => {
      Expectations.benford(tbl(s, d, "lineitem"),
        floor(col("l_extendedprice").cast("double") * 100 + lit(0.5)))
    }),

    // Pairwise association rules over order baskets (co-purchase
    // A ⇒ B with support / confidence / lift): a-priori pruning keeps
    // infrequent items out of the pair expansion entirely, the basket
    // guard bounds per-basket fan-out, and the scores are fixed-shape
    // IEEE ops on integer supports — bit-exact without grid rounding
    // (Association.pairRules).
    "assoc_rules" -> ((s, d) => {
      graft.operators.Association.pairRules(tbl(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2L, k = 100)
    }),

    // Chi-square independence decomposition of return flag × line
    // status: the categorical-association drift gate, per-cell so
    // the differential compare covers the whole table
    // (Experiments.chi2Independence).
    "ab_chi2" -> ((s, d) => {
      Experiments.chi2Independence(tbl(s, d, "lineitem"),
        col("l_returnflag"), col("l_linestatus"))
    }),

    // Two-sample KS drift statistic between return-flag populations:
    // exact integer numerator over the distinct-value CDF merge — the
    // shape-shift detector a mean test misses (Experiments.ksTest).
    "ab_ks_test" -> ((s, d) => {
      Experiments.ksTest(tbl(s, d, "lineitem"), col("l_returnflag"),
        col("l_extendedprice"), groupA = "R", groupB = "A")
    }),

    // Exact per-group median ± MAD of price: the robust center+scale
    // pair outlier gates quote (stddev is poisoned by the outliers
    // being gated). One fused counts-map aggregation below the
    // distinct budget, windowed distinct-value passes above it;
    // integers throughout (Profiling.medianAbsDeviation).
    "agg_mad" -> ((s, d) => {
      graft.operators.Profiling.medianAbsDeviation(tbl(s, d, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"))
    }),

    // The SAME median ± MAD through the ABOVE-budget branch:
    // distinctBudget = 0 forces the original windowed two-phase
    // distinct-value spelling (the >2M-distinct scale path), putting
    // that branch of the adaptive split behind its own DuckDB
    // hash-match row; bit-identical to agg_mad by construction, so the
    // oracle SQL is shared verbatim.
    "agg_mad_refined" -> ((s, d) => {
      graft.operators.Profiling.medianAbsDeviation(tbl(s, d, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"), distinctBudget = 0L)
    }),

    // Exact 5%-trimmed mean price per return flag: the robust
    // central-tendency profile (outlier-immune mean) via the
    // distinct-value decomposition — integer band overlap per
    // distinct value, exact cent sums (Profiling.trimmedMean).
    "agg_trimmed_mean" -> ((s, d) => {
      graft.operators.Profiling.trimmedMean(tbl(s, d, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"), trimPct = 5)
    }),

    // Exact percentile-rank normalization of a quality score (the
    // score → corpus-percentile map curation thresholds ride on),
    // computed over the DISTINCT-VALUE table instead of a corpus-sized
    // single-partition percent_rank window (Relational.percentileRank).
    "score_percentile" -> ((s, d) => {
      Relational.percentileRank(
        tbl(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", "pct_rank")
        .select(col("doc_id"), col("n_chars"),
          round4(col("pct_rank")).as("pct_rank"))
    }),

    // Cross-source quantile normalization: each source's length-score
    // distribution mapped onto the global one by exact integer rank
    // arithmetic (t = ceil(r·N / n_s), bucketed CDF lookup) — the
    // harmonization step before per-source quality scores can share
    // one global filter threshold (Relational.quantileNormalize).
    "score_quantile_norm" -> ((s, d) => {
      Relational.quantileNormalize(
        tbl(s, d, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars", outCol = "norm_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("norm_chars"))
    }))

  // The refined-path twins (dq_outliers_refined, agg_mad_refined)
  // share their below-budget query's oracle VERBATIM — both branches
  // of the adaptive split are bit-identical by ProfilingSketchSpec's
  // pins, so one SQL gates both; appended after the literal below.
  // (lazy: baseOracles is declared below, after this summary view)
  lazy val oracles: Map[String, String] = baseOracles ++ Map(
    "dq_outliers_refined" -> baseOracles("dq_outliers"),
    "agg_mad_refined" -> baseOracles("agg_mad"))

  private val baseOracles: Map[String, String] = Map(

    "dq_referential" ->
      """WITH p AS (
           SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 3 <> 0)
         SELECT count(*)::BIGINT AS n_child,
           sum(CASE WHEN p.c_custkey IS NULL AND o_custkey IS NOT NULL
                 THEN 1 ELSE 0 END)::BIGINT AS n_orphans,
           floor((count(*) - sum(CASE WHEN p.c_custkey IS NULL
                   AND o_custkey IS NOT NULL THEN 1 ELSE 0 END))::DOUBLE
               / count(*) * 10000 + 0.5) / 10000 AS coverage
         FROM orders o LEFT JOIN p ON o.o_custkey = p.c_custkey""",

    "hist_equidepth" ->
      """WITH c AS (
           SELECT n_chars AS v, count(*)::BIGINT AS cnt
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
         cum AS (
           SELECT v, cnt,
             sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS below
           FROM c),
         nn AS (SELECT count(*)::BIGINT AS n FROM documents
                WHERE n_chars IS NOT NULL)
         SELECT ((below * 8) // n)::BIGINT AS bucket,
           sum(cnt)::BIGINT AS n_rows, min(v) AS lo, max(v) AS hi
         FROM cum CROSS JOIN nn GROUP BY 1""",

    "aqp_group_sum" ->
      """WITH s AS (
           SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice::DOUBLE * 256 + 0.5) AS BIGINT) AS u
           FROM lineitem
           WHERE ('0x' || substring(md5((l_orderkey * 10 + l_linenumber)::VARCHAR),
               1, 15))::BIGINT % 10000 < 200)
         SELECT grp, count(*)::BIGINT AS n_sampled,
           sum(u)::DOUBLE / 256.0 / 0.02 AS est_sum,
           sqrt(sum(u * u)::DOUBLE / 65536.0 * ((1.0 - 0.02) / (0.02 * 0.02))) AS stderr
         FROM s GROUP BY grp""",

    "weighted_median" ->
      """WITH pv AS (
           SELECT l_returnflag AS grp, l_extendedprice AS v,
             sum(CAST(floor(l_quantity::DOUBLE + 0.5) AS BIGINT)) AS vw
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL
             AND CAST(floor(l_quantity::DOUBLE + 0.5) AS BIGINT) > 0
           GROUP BY 1, 2),
         cum AS (
           SELECT grp, v, vw, sum(vw) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pv),
         tot AS (SELECT grp, sum(vw) AS tw FROM pv GROUP BY 1)
         SELECT grp, min(v) AS w_median, tw::BIGINT AS total_weight
         FROM cum JOIN tot USING (grp)
         WHERE cum * 2 >= tw GROUP BY grp, tw""",

    "dq_benford" -> {
      val vals = graft.operators.Expectations.BenfordP.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, $p::DOUBLE)" }.mkString(", ")
      s"""WITH p(digit, p) AS (VALUES $vals),
         obs AS (
           SELECT substring(CAST(m AS VARCHAR), 1, 1)::INTEGER AS digit,
             count(*)::BIGINT AS n_obs
           FROM (SELECT CAST(floor(l_extendedprice::DOUBLE * 100 + 0.5)
             AS BIGINT) AS m FROM lineitem)
           WHERE m > 0 GROUP BY 1),
         tot AS (SELECT sum(n_obs)::BIGINT AS n FROM obs)
         SELECT p.digit, coalesce(o.n_obs, 0)::BIGINT AS n_obs,
           n::DOUBLE * p.p AS expected,
           ((coalesce(o.n_obs, 0)::DOUBLE - n::DOUBLE * p.p)
             * (coalesce(o.n_obs, 0)::DOUBLE - n::DOUBLE * p.p))
             / (n::DOUBLE * p.p) AS chi_contrib
         FROM p LEFT JOIN obs o ON o.digit = p.digit CROSS JOIN tot"""
    },

    "assoc_rules" ->
      """WITH b AS (
           SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
           WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         sized AS (
           SELECT bk, it FROM b
           JOIN (SELECT bk, count(*)::BIGINT AS bn
                 FROM b GROUP BY 1) USING (bk)
           WHERE bn <= 256),
         nb AS (SELECT count(DISTINCT bk)::BIGINT AS n_baskets FROM sized),
         itemn AS (SELECT it, count(*)::BIGINT AS item_n
                   FROM sized GROUP BY 1),
         freq AS (SELECT it FROM itemn WHERE item_n >= 2),
         pruned AS (SELECT bk, it FROM sized JOIN freq USING (it)),
         pairs AS (
           SELECT a.it AS it, b2.it AS it2, count(*)::BIGINT AS pair_n
           FROM pruned a JOIN pruned b2 ON a.bk = b2.bk AND a.it < b2.it
           GROUP BY 1, 2 HAVING count(*) >= 2),
         rules AS (
           SELECT it AS ante, it2 AS cons, pair_n FROM pairs
           UNION ALL
           SELECT it2 AS ante, it AS cons, pair_n FROM pairs)
         SELECT r.ante, r.cons, r.pair_n,
           ia.item_n AS ante_n, ic.item_n AS cons_n,
           r.pair_n::DOUBLE / ia.item_n::DOUBLE AS conf,
           (r.pair_n::DOUBLE * n_baskets::DOUBLE)
             / (ia.item_n::DOUBLE * ic.item_n::DOUBLE) AS lift
         FROM rules r
         JOIN itemn ia ON ia.it = r.ante
         JOIN itemn ic ON ic.it = r.cons
         CROSS JOIN nb
         ORDER BY conf DESC, ante, cons
         LIMIT 100""",

    "ab_chi2" ->
      """WITH cells AS MATERIALIZED (
           SELECT l_returnflag AS a, l_linestatus AS b,
             count(*)::BIGINT AS n_obs
           FROM lineitem
           WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
           GROUP BY 1, 2),
         rn AS (SELECT a, sum(n_obs)::BIGINT AS an FROM cells GROUP BY 1),
         cn AS (SELECT b, sum(n_obs)::BIGINT AS bn FROM cells GROUP BY 1),
         tot AS (SELECT sum(n_obs)::BIGINT AS n FROM cells)
         SELECT c.a, c.b, c.n_obs,
           (rn.an::DOUBLE * cn.bn::DOUBLE) / n::DOUBLE AS expected,
           ((c.n_obs::DOUBLE - (rn.an::DOUBLE * cn.bn::DOUBLE) / n::DOUBLE)
             * (c.n_obs::DOUBLE - (rn.an::DOUBLE * cn.bn::DOUBLE) / n::DOUBLE))
             / ((rn.an::DOUBLE * cn.bn::DOUBLE) / n::DOUBLE) AS chi_contrib
         FROM cells c
         JOIN rn ON rn.a = c.a
         JOIN cn ON cn.b = c.b
         CROSS JOIN tot""",

    "ab_ks_test" ->
      """WITH pv AS MATERIALIZED (
           SELECT l_extendedprice AS v,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::BIGINT AS cb
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_returnflag IN ('R', 'A')
           GROUP BY 1),
         cum AS (
           SELECT v,
             sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
             sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
           FROM pv),
         tot AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM pv)
         SELECT n_a, n_b,
           max(abs(cuma * n_b - cumb * n_a))::BIGINT AS d_num,
           max(abs(cuma * n_b - cumb * n_a))::DOUBLE
             / (n_a::DOUBLE * n_b::DOUBLE) AS ks
         FROM cum CROSS JOIN tot GROUP BY n_a, n_b""",

    "agg_mad" ->
      """WITH base AS MATERIALIZED (
           SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice::DOUBLE * 100 + 0.5) AS BIGINT) AS vc
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         pv1 AS MATERIALIZED (
           SELECT grp, vc, count(*)::BIGINT AS cnt FROM base GROUP BY 1, 2),
         cum1 AS (
           SELECT grp, vc, cnt, sum(cnt) OVER (PARTITION BY grp ORDER BY vc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pv1),
         tot1 AS (SELECT grp, sum(cnt)::BIGINT AS n FROM pv1 GROUP BY 1),
         med AS MATERIALIZED (
           SELECT grp, n, min(vc) AS med_c
           FROM cum1 JOIN tot1 USING (grp)
           WHERE cum * 2 >= n GROUP BY grp, n),
         dev AS MATERIALIZED (
           SELECT b.grp, abs(b.vc - m.med_c) AS vc
           FROM base b JOIN med m ON m.grp = b.grp),
         pv2 AS MATERIALIZED (
           SELECT grp, vc, count(*)::BIGINT AS cnt FROM dev GROUP BY 1, 2),
         cum2 AS (
           SELECT grp, vc, cnt, sum(cnt) OVER (PARTITION BY grp ORDER BY vc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pv2),
         tot2 AS (SELECT grp, sum(cnt)::BIGINT AS n FROM pv2 GROUP BY 1),
         mad AS (
           SELECT grp, min(vc) AS mad_c
           FROM cum2 JOIN tot2 USING (grp)
           WHERE cum * 2 >= n GROUP BY grp)
         SELECT m.grp, m.n,
           m.med_c::DOUBLE / 100.0 AS v_median,
           d.mad_c::DOUBLE / 100.0 AS mad
         FROM med m JOIN mad d ON d.grp = m.grp""",

    "agg_trimmed_mean" ->
      """WITH pv AS (
           SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice::DOUBLE * 100 + 0.5) AS BIGINT) AS vc,
             count(*)::BIGINT AS cnt
           FROM lineitem WHERE l_extendedprice IS NOT NULL
           GROUP BY 1, 2),
         cum AS (
           SELECT grp, vc, cnt,
             sum(cnt) OVER (PARTITION BY grp ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS below
           FROM pv),
         tot AS (SELECT grp, sum(cnt)::BIGINT AS n FROM pv GROUP BY 1),
         banded AS (
           SELECT c.grp, t.n, c.vc,
             greatest(0, least(c.below + c.cnt,
                 t.n - CAST(floor(t.n::DOUBLE * 5 / 100.0) AS BIGINT))
               - greatest(c.below,
                 CAST(floor(t.n::DOUBLE * 5 / 100.0) AS BIGINT))) AS kept
           FROM cum c JOIN tot t ON t.grp = c.grp)
         SELECT grp, n, sum(kept)::BIGINT AS n_kept,
           CASE WHEN sum(kept) > 0 THEN
             (sum(vc * kept)::DOUBLE / 100.0) / sum(kept)::DOUBLE
           END AS trimmed_mean
         FROM banded GROUP BY grp, n""",

    "score_percentile" ->
      """SELECT doc_id, n_chars,
           floor(((rank() OVER (ORDER BY n_chars)) - 1)::DOUBLE
                 / ((count(*) OVER ()) - 1)::DOUBLE * 10000 + 0.5) / 10000
             AS pct_rank
         FROM documents""",

    "score_quantile_norm" ->
      """WITH b AS (
           SELECT doc_id, source, n_chars FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL),
         pv AS MATERIALIZED (
           SELECT source, n_chars AS v, count(*)::BIGINT AS c
           FROM b GROUP BY 1, 2),
         sr AS (
           SELECT source, v,
             sum(c) OVER (PARTITION BY source ORDER BY v)::BIGINT AS r,
             sum(c) OVER (PARTITION BY source)::BIGINT AS ns
           FROM pv),
         gr AS MATERIALIZED (
           SELECT v, gc, sum(gc) OVER (ORDER BY v)::BIGINT AS hi FROM (
             SELECT v, sum(c)::BIGINT AS gc FROM pv GROUP BY 1)),
         g AS (SELECT v, hi - gc + 1 AS lo, hi FROM gr),
         n AS (SELECT max(hi)::BIGINT AS n FROM gr),
         t AS (
           SELECT source, v, ((r * n.n + ns - 1) // ns)::BIGINT AS t
           FROM sr CROSS JOIN n),
         m AS (
           SELECT t.source, t.v, g.v AS norm
           FROM t JOIN g ON t.t BETWEEN g.lo AND g.hi)
         SELECT b.doc_id, b.source, b.n_chars, m.norm AS norm_chars
         FROM b JOIN m ON b.source = m.source AND b.n_chars = m.v""",

    "sketch_distinct" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           count(DISTINCT o_custkey) AS n_exact,
           true AS sketch_ok, true AS merge_ok
         FROM orders GROUP BY 1""",

    "ts_gaps" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
           FROM events)
         SELECT user_id, prev AS gap_start_us, t AS gap_end_us,
                t - prev AS gap_us
         FROM e
         WHERE prev IS NOT NULL AND t - prev > 36::BIGINT * 3600 * 1000000""",
    "ts_debounce" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS prev
           FROM events)
         SELECT event_id, user_id, event_type, ts_us
         FROM e
         WHERE prev IS NULL OR ts_us - prev > 6::BIGINT * 3600 * 1000000""",
    "dq_outliers" ->
      """WITH b AS (
           SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS v FROM lineitem),
         med AS (SELECT grp, quantile_cont(v, 0.5) AS med FROM b GROUP BY grp),
         dev AS (
           SELECT b.grp, med, abs(v - med) AS absdev
           FROM b JOIN med ON b.grp = med.grp),
         mad AS (SELECT grp, quantile_cont(absdev, 0.5) AS mad FROM dev GROUP BY grp)
         SELECT dev.grp AS l_returnflag,
           floor(med * 10000 + 0.5) / 10000 AS med,
           floor(mad * 10000 + 0.5) / 10000 AS mad,
           count(*) AS n_rows,
           sum(CASE WHEN (mad > 0 AND absdev > mad * 5.0)
                      OR (mad = 0 AND absdev > 0) THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers
         FROM dev JOIN mad ON dev.grp = mad.grp
         GROUP BY dev.grp, med, mad""",
    "sketch_topk" ->
      """WITH s AS (
           SELECT CASE WHEN l_orderkey % 2 = 0
                       THEN 'hot_' || CAST(l_orderkey % 3 AS VARCHAR)
                       ELSE 'cold_' || CAST(l_orderkey % 30011 AS VARCHAR) END AS item
           FROM lineitem),
         t AS (SELECT count(*)::BIGINT AS n FROM s)
         SELECT item FROM s CROSS JOIN t
         GROUP BY item, n
         HAVING count(*) >= floor(n * 0.125)""",
    "sketch_quantile" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           CAST(count(*) AS BIGINT) AS n_rows,
           true AS sketch_ok, true AS merge_ok
         FROM orders GROUP BY 1""",

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
         s2 AS (SELECT e.user_id, t1, min(t) AS t2 FROM e JOIN s1 USING(user_id)
                WHERE event_type='click' AND t > t1 GROUP BY e.user_id, t1),
         s3 AS (SELECT e.user_id, t1, min(t) AS t3 FROM e JOIN s2 USING(user_id)
                WHERE event_type='purchase' AND t > t2 GROUP BY e.user_id, t1)
         SELECT 'view' AS step, 0 AS step_idx, count(*) AS n_users, 0.0 AS avg_secs FROM s1
         UNION ALL SELECT 'click', 1, count(*),
           floor((sum(t2-t1)::DOUBLE / count(*) / 1000000)*100+0.5)/100 FROM s2
         UNION ALL SELECT 'purchase', 2, count(*),
           floor((sum(t3-t1)::DOUBLE / count(*) / 1000000)*100+0.5)/100 FROM s3""",

    "link_fuzzy" ->
      """WITH clean AS (SELECT c_custkey, c_name FROM customer),
         dirty AS (SELECT c_custkey AS dirty_id,
             CASE WHEN c_custkey % 3 = 0
                    THEN substring(c_name,1,9) || 'X' || substring(c_name,11,8)
                  WHEN c_custkey % 3 = 1
                    THEN substring(c_name,1,10) || substring(c_name,12,7)
                  ELSE c_name END AS dirty_name
           FROM clean),
         cand AS (
           SELECT DISTINCT dirty_id, dirty_name, c_custkey, c_name FROM (
             SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
               FROM dirty d JOIN clean c ON right(d.dirty_name,4) = right(c.c_name,4)
             UNION ALL
             SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
               FROM dirty d JOIN clean c ON right(d.dirty_name,3) = right(c.c_name,3))),
         ver AS (SELECT *, levenshtein(dirty_name, c_name) AS dist
                 FROM cand WHERE levenshtein(dirty_name, c_name) <= 1),
         ranked AS (SELECT *,
             count(*) OVER (PARTITION BY dirty_id) AS n_candidates,
             row_number() OVER (PARTITION BY dirty_id ORDER BY dist, c_custkey) AS rn
           FROM ver)
         SELECT dirty_id, dirty_name, c_custkey AS matched_custkey,
           c_name AS matched_name, dist, n_candidates
         FROM ranked WHERE rn = 1""",

    "dq_expectations" ->
      """WITH m AS (SELECT
           count(*)::DOUBLE AS m0,
           avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS m1,
           count(DISTINCT o_orderkey)::DOUBLE / count(*) AS m2,
           min(o_totalprice) AS m3,
           max(o_totalprice) AS m4,
           avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END) AS m5,
           count(DISTINCT o_orderpriority)::DOUBLE AS m6
           FROM orders)
         SELECT 'size_min' AS check_name, floor(m0*10000+0.5)/10000 AS metric, m0 >= 1000 AS passed FROM m
         UNION ALL SELECT 'completeness_custkey', floor(m1*10000+0.5)/10000, m1 = 1.0 FROM m
         UNION ALL SELECT 'uniqueness_orderkey', floor(m2*10000+0.5)/10000, m2 = 1.0 FROM m
         UNION ALL SELECT 'totalprice_min_nonneg', floor(m3*10000+0.5)/10000, m3 >= 0.0 FROM m
         UNION ALL SELECT 'totalprice_max_bound', floor(m4*10000+0.5)/10000, m4 <= 1000000.0 FROM m
         UNION ALL SELECT 'status_in_set', floor(m5*10000+0.5)/10000, m5 = 1.0 FROM m
         UNION ALL SELECT 'priority_cardinality', floor(m6*10000+0.5)/10000, m6 <= 10.0 FROM m""",

    "cohort_retention" ->
      """WITH up AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
                     FROM events WHERE event_type = 'purchase'),
         first AS (SELECT user_id, min(period) AS cohort FROM up GROUP BY 1),
         sizes AS (SELECT cohort, count(*) AS n_cohort FROM first GROUP BY 1),
         act AS (SELECT f.cohort, up.period - f.cohort AS offset, count(*) AS n_active
                 FROM up JOIN first f USING(user_id) GROUP BY 1, 2)
         SELECT a.cohort, a.offset, a.n_active,
           floor((a.n_active::DOUBLE / s.n_cohort)*10000+0.5)/10000 AS retention
         FROM act a JOIN sizes s USING(cohort)""",

    "ts_anomaly" ->
      """WITH w AS (
           SELECT event_id, user_id, value,
             avg(value) OVER fr AS m,
             avg(value*value) OVER fr AS m2,
             count(*) OVER fr AS n
           FROM events
           WINDOW fr AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
         z AS (
           SELECT event_id, user_id,
             floor(((value - m) / sqrt(m2 - m*m))*100+0.5)/100 AS z
           FROM w WHERE n >= 4 AND m2 - m*m > 0)
         SELECT event_id, user_id, z, abs(z) > 2.0 AS is_anomaly FROM z""",

    "funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
         s2 AS (SELECT e.user_id, t1, min(t) AS t2 FROM e JOIN s1 USING(user_id)
                WHERE event_type='click' AND t > t1 AND t < t1 + 604800000000 GROUP BY e.user_id, t1),
         s3 AS (SELECT e.user_id, t1, min(t) AS t3 FROM e JOIN s2 USING(user_id)
                WHERE event_type='purchase' AND t > t2 AND t < t1 + 604800000000 GROUP BY e.user_id, t1)
         SELECT 'view' AS step, 0 AS step_idx, count(*) AS n_users, 0.0 AS avg_secs FROM s1
         UNION ALL SELECT 'click', 1, count(*),
           floor((sum(t2-t1)::DOUBLE / count(*) / 1000000)*100+0.5)/100 FROM s2
         UNION ALL SELECT 'purchase', 2, count(*),
           floor((sum(t3-t1)::DOUBLE / count(*) / 1000000)*100+0.5)/100 FROM s3""",

    "session_assign" ->
      """WITH m AS (
           SELECT event_id, user_id, epoch_us(ts) AS t,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
         SELECT event_id, user_id,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         FROM m""",

    "ab_ttest" ->
      """WITH a AS (
           SELECT event_type,
             CASE WHEN (('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT % 10000) < 5000
                  THEN 'A' ELSE 'B' END AS arm,
             value
           FROM events),
         g AS (SELECT event_type, arm, count(*) AS n, sum(value) AS s,
                 sum(value*value) AS s2
               FROM a GROUP BY 1, 2),
         w AS (SELECT event_type,
             max(CASE WHEN arm='A' THEN n END) AS n_a,
             max(CASE WHEN arm='A' THEN s END) AS s_a,
             max(CASE WHEN arm='A' THEN s2 END) AS s2_a,
             max(CASE WHEN arm='B' THEN n END) AS n_b,
             max(CASE WHEN arm='B' THEN s END) AS s_b,
             max(CASE WHEN arm='B' THEN s2 END) AS s2_b
           FROM g GROUP BY 1)
         SELECT event_type, n_a, n_b,
           floor((s_a/n_a)*10000+0.5)/10000 AS mean_a,
           floor((s_b/n_b)*10000+0.5)/10000 AS mean_b,
           floor(((s_a/n_a - s_b/n_b) /
                  sqrt(((s2_a - s_a*s_a/n_a)/(n_a-1))/n_a
                     + ((s2_b - s_b*s_b/n_b)/(n_b-1))/n_b))*10000+0.5)/10000 AS t_stat
         FROM w""",

    "path_transitions" ->
      """WITH s AS (
           SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS dst
           FROM events),
         c AS (SELECT src, dst, count(*) AS n FROM s
               WHERE dst IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT src, sum(n) AS tot FROM c GROUP BY 1)
         SELECT c.src, c.dst, c.n,
           floor((c.n::DOUBLE / t.tot)*10000+0.5)/10000 AS p
         FROM c JOIN t USING(src)""",

    "agg_salted" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
           floor((sum(l_quantity))*100+0.5)/100 AS sum_qty
         FROM lineitem GROUP BY 1""",

    "skew_report" ->
      """WITH pk AS (SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(n) AS total, count(*) AS nkeys FROM pk),
         top AS (SELECT key, n FROM pk ORDER BY n DESC, key LIMIT 10)
         SELECT key, n, floor((n::DOUBLE / total)*10000+0.5)/10000 AS share,
           floor((n::DOUBLE * nkeys / total)*10000+0.5)/10000 AS x_mean
         FROM top, tot""",

    "ts_resample" ->
      """WITH b AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS bucket, value,
             row_number() OVER (
               PARTITION BY user_id, epoch_us(ts) // 86400000000
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events),
         obs AS (SELECT user_id, bucket, value FROM b WHERE rn = 1),
         span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
                  FROM obs GROUP BY 1),
         cal AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
                 FROM span),
         j AS (SELECT c.user_id, c.bucket, o.value,
                 o.value IS NOT NULL AS is_observed
               FROM cal c LEFT JOIN obs o
                 ON c.user_id = o.user_id AND c.bucket = o.bucket)
         SELECT user_id, bucket,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           is_observed
         FROM j""")
}
