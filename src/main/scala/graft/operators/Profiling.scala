package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus profiling — the "data card" numbers every training-data
  * pipeline reports before a corpus ships: per-group document / token /
  * character counts, exact length quantiles, and the exact-duplicate
  * rate.
  *
  * Scale shape: ONE partial-agg groupBy. The map side reduces every
  * document to a handful of scalars (token count, char count, content
  * hash) inside the scan's projection, so the exchange carries per-group
  * partial states only. The exact quantiles use Spark's counts-map
  * `percentile` — memory is bounded by the number of DISTINCT lengths
  * per group (thousands), not the number of documents (billions), so
  * exactness survives 100 TB. The duplicate rate is a count-distinct on
  * the 16-byte content hash — the one genuinely corpus-sized state, and
  * the same two-phase distinct aggregation every engine pays for it.
  */
object Profiling {

  def corpusProfile(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(groupCol), TextAnalysis.tokenCount(t).as("__ntok"),
        length(t).as("__nchars"), md5(t).as("__h"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).cast("bigint").as("n_tokens"),
        sum(col("__nchars")).cast("bigint").as("n_chars"),
        min(col("__nchars")).as("len_min"),
        percentile(col("__nchars"), lit(0.25)).as("len_p25"),
        percentile(col("__nchars"), lit(0.5)).as("len_p50"),
        percentile(col("__nchars"), lit(0.75)).as("len_p75"),
        max(col("__nchars")).as("len_max"),
        countDistinct(col("__h")).as("n_distinct"),
        ((count(lit(1)) - countDistinct(col("__h"))).cast("double") /
          count(lit(1)).cast("double")).as("dup_rate"))
  }

  /** Bin count for [[refinedMedian]]'s histogram pass. 2^16 bins keep
    * the per-(group, bin) count table node-sized while cutting the
    * refine subset to ~n/65536 rows per group on anything resembling a
    * continuous distribution. */
  private[graft] val HistBins = 65536

  /** Exact INTERPOLATED per-group median (quantile_cont semantics:
    * mean of the rank-⌊(n+1)/2⌋ and rank-⌊n/2⌋+1 values — equal for
    * odd n) by histogram refinement, the distributed exact-quantile
    * shape that survives continuous columns.
    *
    * Spark's counts-map `percentile` holds EVERY distinct value per
    * group in one aggregation buffer — on a continuous column that
    * buffer approaches row count per group (measured 5× the cost of a
    * plain codegen agg on a money column, and an OOM at 10⁹ distinct).
    * Here every corpus-sized pass is a plain codegen counting agg:
    *
    *  1. per-group min/max/count (`stats`, group-sized);
    *  2. per-(group, bin) counts over [[HistBins]] uniform bins;
    *     a bin-sized cumulative-rank window then locates the 1-2 bins
    *     holding the two middle ranks plus their rank offset;
    *  3. a refine pass re-scans only rows INSIDE those bins (semi
    *     join against the broadcast hit set), pre-aggregates them to
    *     distinct values, and picks the two target ranks off a tiny
    *     per-group cumulative window.
    *
    * Exactness does not depend on the bin width: the hit bins contain
    * the true rank positions by construction, and the refine step is
    * an exact rank selection within them (an adversarial distribution
    * that piles everything into one bin degrades to a rank-select over
    * that bin — never to a wrong answer). Bit-identical to
    * `percentile(v, 0.5)` / DuckDB `quantile_cont` (same two ranks,
    * same mean-of-two arithmetic). Finite values only; a group whose
    * values are all null is dropped (callers left-join and carry the
    * null).
    *
    * @param base  (grp, v: double) — scanned twice (bin + refine)
    * @param stats (grp, mn, mx, n ≥ 1, r1, r2) — MATERIALIZED
    *              group-sized frame (it feeds two broadcast joins;
    *              a lazy frame would re-run its corpus agg per use)
    * @return (grp, med) */
  /** Collect a GROUP-SIZED frame once and rebuild it as a
    * LocalRelation: one job total, and every downstream broadcast
    * join builds from the local rows without scheduling a
    * materialization job (the former checkpoint+broadcast spelling
    * paid a checkpoint job AND still collected the rows to the driver
    * inside the broadcast build). Callers guarantee the frame is
    * bounded by the group count — the same contract a broadcast build
    * side already imposes. */
  private def localized(df: DataFrame): (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val rows = df.collect()
    (df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema), rows)
  }

  private[graft] def refinedMedian(rawBase: DataFrame, stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Null values are invisible to the median (percentile semantics);
    // unfiltered they'd fall into bin 0 of a width-0 group and shift
    // the refine window's ranks (nulls sort first).
    val base = rawBase.filter(col("v").isNotNull)
    val B = HistBins
    val width = (col("mx") - col("mn")) / B
    val binExpr = when(width <= 0, lit(0)).otherwise(
      least(lit(B - 1), greatest(lit(0),
        floor((col("v") - col("mn")) / width).cast("int"))))
    // hit = the 1-2 bins whose expanded rank range [lo, cum] touches
    // {r1, r2} (≤2 occupied bins can, since r2 ≤ r1+1); contiguous in
    // rank even across absent (empty) bins, so ranks inside the hit
    // subset are global rank − off + 1, off = the first hit bin's lo.
    // The locate is ONE corpus pass (r16): per-(grp, bin) counts, then
    // an ORDERED FOLD over each group's occupied-bin array — the
    // window's exact cum/lo arithmetic, bins ascending — replaces the
    // former bin-table window + localCheckpoint + two broadcast builds
    // (a group-partitioned sort and 3 scheduled jobs) with one
    // in-aggregation scan. Fold state is (cum, h1, h2, off); the
    // per-group array is bounded by occupied bins ≤ HistBins (~1 MB) —
    // the budget the bin table itself already carries, at any corpus
    // size. sort_array gives the ascending bin order the window's
    // orderBy provided (bins are unique per group, so the order is
    // total and the fold deterministic).
    val located = base.join(broadcast(stats), Seq("grp"))
      .groupBy(col("grp"), col("mn"), col("mx"), col("n"), col("r1"),
        col("r2"), binExpr.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("grp"), col("mn"), col("mx"), col("n"), col("r1"),
        col("r2"))
      .agg(expr(
        """aggregate(
             sort_array(collect_list(struct(bin, cnt))),
             named_struct('cum', 0L, 'h1', cast(null as int),
                          'h2', cast(null as int),
                          'off', cast(null as bigint)),
             (a, x) -> named_struct(
               'cum', a.cum + x.cnt,
               'h1', if(a.cum + 1L <= r2 and a.cum + x.cnt >= r1
                        and a.h1 is null, x.bin, a.h1),
               'h2', if(a.cum + 1L <= r2 and a.cum + x.cnt >= r1
                        and a.h1 is not null, x.bin, a.h2),
               'off', if(a.cum + 1L <= r2 and a.cum + x.cnt >= r1
                         and a.off is null, a.cum + 1L, a.off)))""").as("loc"))
      .select(col("grp"), col("mn"), col("mx"), col("n"), col("r1"),
        col("r2"), col("loc.h1").as("h1"), col("loc.h2").as("h2"),
        col("loc.off").as("off"))
    // group-sized; collect once and rebuild as a LocalRelation so the
    // refine pass's single broadcast builds job-free — and the refine
    // keeps ONE broadcast join where the former spelling paid three
    // (stats + hit semi-join + off).
    val (loc, _) = localized(located)
    val wv = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(loc), Seq("grp"))
      // same rows as the former semi join: bin ∈ {h1, h2} (h2 null on
      // single-bin hits — the null comparison is falsy, never a match)
      .filter(binExpr === col("h1") || binExpr === col("h2"))
      .groupBy(col("grp"), col("n"), col("r1"), col("r2"), col("off"),
        col("v"))
      .agg(count(lit(1)).as("cnt")) // distinct-value table of the hit bins
      .withColumn("t1", col("r1") - col("off") + 1)
      .withColumn("t2", col("r2") - col("off") + 1)
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("lo", col("cum") - col("cnt") + 1)
      .groupBy(col("grp"))
      .agg(
        min(when(col("lo") <= col("t1") && col("cum") >= col("t1"), col("v")))
          .as("v1"),
        min(when(col("lo") <= col("t2") && col("cum") >= col("t2"), col("v")))
          .as("v2"))
      // 0.5·v1 + 0.5·v2, not (v1+v2)/2: for NORMAL doubles the 0.5
      // products are exact, so the two forms round identically — but
      // the sum form overflows to Infinity when the two middle values
      // sum past DBL_MAX, where this form stays finite. The trade-off
      // lives at the other extreme: a SUBNORMAL middle value (<2⁻¹⁰²²)
      // makes 0.5·v inexact, where the sum form would not be — medians
      // of subnormal-valued columns sit far outside any gated domain,
      // and the overflow end is the one a real (huge-magnitude score)
      // column could plausibly touch.
      .select(col("grp"),
        (col("v1") * lit(0.5) + col("v2") * lit(0.5)).as("med"))
  }

  /** Robust per-group outlier report — median/MAD instead of mean/σ,
    * so a contaminated column cannot mask its own outliers (the
    * breakdown point of the mean is 0%; of the median, 50%). Per
    * group: the exact interpolated median (quantile_cont semantics:
    * mean of the rank-⌊(n+1)/2⌋ and rank-⌊n/2⌋+1 values — equal for
    * odd n), the median absolute deviation, and the count of rows
    * with |x − med| > k·MAD.
    *
    * ADAPTIVE plan choice, decided by one stats pass (min/max/count +
    * HLL distinct estimate per group, all codegen, collected as one
    * group-sized row set):
    *
    *  - distinct values per group ≤ `distinctBudget`: THREE corpus
    *    passes total — the stats probe, the counts-map `percentile`
    *    median, and one fused [[org.apache.spark.sql.graftx.MadOutliersAgg]]
    *    pass answering the MAD and the k·MAD tail count from the same
    *    deviation counts-map (the cheapest exact form when the
    *    per-group value-map fits an aggregation buffer; measured:
    *    every multi-stage alternative loses to it below ~1M distinct,
    *    the map IS the data);
    *  - above the budget: [[refinedMedian]] histogram refinement —
    *    every corpus pass a plain counting agg, memory bounded by
    *    [[HistBins]] regardless of cardinality. The counts-map form
    *    would hold ~10⁹ distinct doubles per group at the 100-TB
    *    shape and die; the budget is set where its buffer (~16 B per
    *    distinct) stays tens of MB. The MAD median's bin range
    *    [0, max(mx−med, med−mn)] derives from stats — no extra pass.
    *
    * Both paths are bit-identical (pinned by ProfilingSketchSpec on
    * odd/even/duplicate/null fixtures and a randomized sweep). A
    * zero-MAD group (>50% identical values) reports outliers as rows
    * differing from the median at all. Null values count in n_rows,
    * are ignored by both medians, and are never outliers. For a
    * sketch-precision serving path with ONE scan and ONE shuffle, use
    * [[robustOutliersSketch]]. */
  def robustOutliers(df: DataFrame, groupCol: Column, valueCol: Column,
                     k: Double = 5.0,
                     distinctBudget: Long = 2000000L): DataFrame = {
    // NO spread+materialize of the corpus projection here (unlike
    // medianAbsDeviation, where the spread REPLACES an existing
    // checkpoint): this operator never checkpointed its base, and the
    // measured A/B at sf0.1 (single-row-group parquet, the layout the
    // spread was meant to help) read dq_outliers_refined 4.97 s plain
    // vs 6.10 s spread — the spread's own shuffle+checkpoint job costs
    // more than the serial re-decodes it saves on a 10 MB file, and
    // every downstream pass re-exchanges by grp anyway. Re-scanning
    // the source per pass stays the cheaper spelling at every layout
    // probed; revisit only with a measured win on a multi-GB input.
    val base = df.select(groupCol.as("grp"), valueCol.cast("double").as("v"))
    // Every intermediate here is GROUP-SIZED, and every consumer uses
    // it as a broadcast build side — which ships the rows through the
    // driver anyway. So collect each one ONCE and rebuild it as a
    // LocalRelation: the path-choice signal reads the same collected
    // rows (no separate max() job), and downstream broadcast joins
    // build job-free from the local rows — no checkpoint
    // materialization job per intermediate. Driver footprint is
    // unchanged vs the former checkpoint+broadcast spelling (a
    // broadcast build collects to the driver regardless); the corpus
    // passes (stats, median, MAD, outlier count) are untouched.
    //
    // The cardinality probe deliberately does NOT ride the median
    // aggregation as an observe metric: the counts-map percentile is
    // exactly the plan that must not RUN over the distinct budget
    // (its agg buffer holds one entry per distinct value — the r8
    // 20M-distinct OOM), so an optimistic first pass would forfeit
    // the survival guarantee the adaptive split exists for. The probe
    // stays a bounded-state stats pass; what the former spelling paid
    // AROUND it (checkpoint jobs, a second driver read) is gone.
    // distinctBudget ≤ 0 pins the refined path outright (the gated
    // *_refined twins, and any caller that KNOWS the column is
    // continuous): the HLL estimate could never come in under the
    // budget, so don't pay its buffer work inside the stats pass.
    val probe = distinctBudget > 0L
    val statAggs = Seq(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(col("v")).as("n")) ++
      (if (probe) Seq(approx_count_distinct(col("v")).as("nd")) else Nil)
    val (stats, statsRows) = localized(base.groupBy(col("grp"))
      .agg(statAggs.head, statAggs.tail: _*)
      .filter(col("n") > 0)
      .withColumn("r1", expr("(n + 1) div 2"))
      .withColumn("r2", expr("n div 2 + 1")))
    val maxDistinct =
      if (!probe) Long.MaxValue // foregone: refined path (empty input
      // included — both paths return the same empty frame)
      else if (statsRows.isEmpty) 0L
      else statsRows.iterator.map(_.getAs[Long]("nd")).max
    if (maxDistinct <= distinctBudget) {
      // Below the budget the whole report is TWO corpus passes: the
      // stats probe above and ONE fused pass answering the median,
      // the MAD and the outlier tail count from a single value
      // counts-map (RobustOutliersAgg — the buffer IS the
      // distribution, so the round-14 full fusion also folds the
      // counts-map `percentile` median pass and its broadcast
      // join-back in). The multi-agg spellings paid extra passes only
      // because each threshold isn't known until the previous
      // aggregate lands. Bit-identical output (ProfilingSketchSpec
      // pins it against the explicit percentile spelling — NaN
      // majority/minority groups included — and against the refined
      // path, which keeps the separate passes).
      return base.groupBy(col("grp"))
        .agg(org.apache.spark.sql.graftx.RobustOutliersAgg
          .robustOutliers(col("v"), k).as("s"))
        .select(col("grp"), col("s.med").as("med"), col("s.mad").as("mad"),
          col("s.n_rows").as("n_rows"), col("s.n_outliers").as("n_outliers"))
    }
    val (med, mad) =
      {
        val (m, _) = localized(refinedMedian(base, stats))
        val devBase = base.join(broadcast(m), Seq("grp"))
          .select(col("grp"), abs(col("v") - col("med")).as("v"))
        // dev-stats = stats ⋈ med over two LocalRelations — a
        // group-sized local join, collected in one trivial job. The
        // join is SQL, not a driver-side Map keyed on Row.get(0): SQL
        // group equality is by VALUE for every type, where a Scala
        // Map over binary group keys (Array[Byte] reference equality)
        // would silently match nothing.
        val (devStats, _) = localized(stats.join(m, Seq("grp"))
          .select(col("grp"), lit(0.0).as("mn"),
            greatest(col("mx") - col("med"), col("med") - col("mn")).as("mx"),
            col("n"), col("r1"), col("r2")))
        val (d, _) = localized(refinedMedian(devBase, devStats)
          .select(col("grp"), col("med").as("mad")))
        (m, d)
      }
    base.join(broadcast(med), Seq("grp"), "left")
      .join(broadcast(mad), Seq("grp"), "left")
      .withColumn("dev", abs(col("v") - col("med")))
      .groupBy(col("grp"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(
          (col("mad") > 0 && col("dev") > col("mad") * k) ||
            (col("mad") === 0 && col("dev") > 0), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** The one-pass form of [[robustOutliers]]: ONE scan, ONE shuffle,
    * bounded state, sketch precision. The exact path's histogram
    * refinement is also scale-safe but the med→MAD data dependency
    * holds it at six corpus passes. Here each group folds into
    * one KLL sketch (fixed size, mergeable, map-side combined) and the
    * median, the MAD, and the outlier count are all answered from that
    * sketch ([[org.apache.spark.sql.graftx.KllAbsDevStats]] reads the
    * retained-item sorted view), so the fact table is read once and the
    * exchange carries one sketch per group.
    *
    * Approximation: KLL rank error ≈ 1.65%·(200/k)^0.9 — the median and
    * MAD are value-quantile approximations and `n_outliers` is a
    * weighted tail estimate. ProfilingSketchSpec bounds all three
    * against [[robustOutliers]]; the exact form remains the oracle
    * path. */
  def robustOutliersSketch(df: DataFrame, groupCol: Column, valueCol: Column,
                           k: Double = 5.0, sketchK: Int = 800): DataFrame = {
    import org.apache.spark.sql.graftx.KllSketch
    val base = df.select(groupCol.as("grp"), valueCol.cast("double").as("v"))
    base.groupBy(col("grp"))
      .agg(KllSketch.sketchAgg(col("v"), sketchK).as("__sk"))
      .withColumn("med", KllSketch.quantile(col("__sk"), lit(0.5)))
      .withColumn("__s", KllSketch.absDevStats(col("__sk"), col("med"), lit(k)))
      .select(col("grp"), col("med"), col("__s.mad").as("mad"),
        col("__s.n_rows").as("n_rows"), col("__s.n_outliers").as("n_outliers"))
  }

  /** Snapshot-to-snapshot distribution drift over a bucketed feature —
    * the monitoring report a recurring crawl/ingest pipeline runs
    * before promoting a new corpus snapshot: per-bucket reference vs
    * current proportions, absolute difference, and the chi-square
    * contribution ((p_cur − p_ref)² / p_ref, null on an empty reference
    * bucket). The chi-square form is used instead of PSI's log-ratio
    * deliberately: it is pure rational arithmetic (+,−,×,÷), which
    * IEEE-754 rounds identically in every engine, so the report is
    * differentially checkable bit-for-bit — `ln` implementations are
    * libm-dependent.
    *
    * `grpCol` must evaluate to 0 (reference) or 1 (current); `binCol`
    * to the bucket id. Scale shape: ONE partial-agg groupBy over the
    * union (the exchange carries per-bucket counts only), then the
    * totals come from a window over the BUCKET-sized aggregate — the
    * corpus is never re-scanned and nothing corpus-sized shuffles. */
  def distributionDrift(df: DataFrame, binCol: Column, grpCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Relational.singlePartitionKey())
    val agg = df.select(binCol.as("bin"), grpCol.as("__grp"))
      .groupBy(col("bin"))
      .agg(sum(when(col("__grp") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__grp") === 1, 1L).otherwise(0L)).as("n_cur"))
    val p = agg
      .withColumn("p_ref", col("n_ref").cast("double") / sum(col("n_ref")).over(w))
      .withColumn("p_cur", col("n_cur").cast("double") / sum(col("n_cur")).over(w))
    val d = col("p_cur") - col("p_ref")
    p.select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"), col("p_cur"),
      abs(d).as("abs_diff"),
      when(col("p_ref") > 0, d * d / col("p_ref")).as("chi2_term"))
  }

  /** Exact equi-depth histogram (the stats-viewer "8 equal-count bins
    * with their bounds" readout): bucket j holds the rows whose
    * strictly-below count lands in [j·n/B, (j+1)·n/B) — ties share a
    * below-count, so equal values never split across buckets (the
    * boundary-based semantics a distributed engine can compute without
    * `ntile()`'s corpus-sized single-partition sort). One partial-agg
    * pass to the DISTINCT-VALUE table, a value-bounded running-sum
    * window, integer-exact bucket arithmetic, and a B-row aggregate —
    * the corpus is scanned once. Null values are excluded (they would
    * otherwise sort into the lowest bucket and shift every rank). For
    * continuous values at 100 TB (V → n) use
    * [[equiDepthHistogramSketch]]. */
  def equiDepthHistogram(df: DataFrame, valueCol: Column,
                         buckets: Int): DataFrame = {
    // NOT fused like the per-group ops: this window is GLOBAL
    // (single-partition), so an unbounded-frame total would re-buffer
    // all V rows serially inside the one window task — the checkpoint
    // computes the total in the parallel aggregation instead (same
    // trade measured on ksTest: 0.9 vs 1.3 s at sf0.1).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(Relational.singlePartitionKey())
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = df.select(valueCol.as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the window AND the total: one scan
    val n = counts.agg(sum(col("cnt")).as("n"))
    counts
      .withColumn("below", sum(col("cnt")).over(w) - col("cnt"))
      .crossJoin(broadcast(n))
      // pure integer floor-div: no double rounding at any n (the old
      // (below·B)::DOUBLE/n spelling could shift a boundary past 2^53)
      // and a loud guard where below·B itself would wrap
      .withColumn("bucket",
        when(col("n").cast("double") * buckets >=
          lit(Relational.ExactIntegerBound),
          raise_error(lit("equiDepthHistogram: n*buckets exceeds the " +
            "exact-integer bound — fewer buckets or pre-bin")))
          .otherwise(expr(s"(below * $buckets) div n")))
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  /** Exact per-group WEIGHTED median — the token-weighted "median
    * document length" / quantity-weighted "median price" readout: the
    * smallest value v whose cumulative weight reaches half the group's
    * total. Same distinct-value decomposition as
    * [[equiDepthHistogram]]: one partial-agg pass to the per-(group,
    * value) weight table, a value-bounded running-sum window, then a
    * one-row-per-group reduce. The half-total comparison is kept in
    * INTEGER arithmetic (2·cum ≥ W, never 0.5·W), so ties and odd
    * totals are bit-identical across engines. Weights round HALF-UP to
    * integers (floor(w + 0.5) — explicit, because a bare long cast
    * truncates in Spark but rounds in DuckDB, and the two diverge on
    * any fractional weight). Null values, null weights, and rows whose
    * weight rounds to ≤ 0 are excluded — a zero-rounded or negative
    * weight contributes nothing to cumulative mass, and keeping such
    * rows would let an all-zero-weight group (tw = 0) report its
    * MINIMUM as a vacuous "median"; a group that loses all rows drops
    * out instead. */
  def weightedMedian(df: DataFrame, groupCol: Column, valueCol: Column,
                     weightCol: Column): DataFrame = {
    val base = df.select(groupCol.as("grp"), valueCol.as("v"),
        floor(weightCol.cast("double") + lit(0.5)).cast("long").as("w"))
      .filter(col("v").isNotNull && col("w") > 0)
    val perValue = base.groupBy(col("grp"), col("v"))
      .agg(sum(col("w")).as("vw"))
    // BOTH sums ride the one grp-partitioned sort: the running mass as
    // a cumulative frame, the group total as an unbounded frame over
    // the same window partitioning — no checkpoint, no totals join,
    // no second pass (the former spelling materialized perValue and
    // joined a separate per-group aggregate back).
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perValue.withColumn("cum", sum(col("vw")).over(win))
      .withColumn("tw", sum(col("vw")).over(winAll))
      .filter(col("cum") * 2 >= col("tw"))
      .groupBy(col("grp"), col("tw"))
      .agg(min(col("v")).as("w_median"))
      .select(col("grp"), col("w_median"), col("tw").as("total_weight"))
  }

  /** Exact per-group TRIMMED mean — the robust central-tendency
    * readout (drop the top and bottom `trimPct`% OCCURRENCES, average
    * the band) that profiling dashboards quote when outliers poison
    * the plain mean. Same distinct-value decomposition as
    * [[weightedMedian]] (per-value counts + a per-group cumulative
    * window over the DISTINCT-value table, never a corpus-row window),
    * with the band overlap computed per distinct value in INTEGER
    * arithmetic: trim = ⌊n·trimPct/100⌋ (spelled floor-of-double on
    * BOTH engines — Spark's `/` on longs is double division and
    * DuckDB's integer `/` semantics changed across versions, so the
    * explicit floor is the only portable integer spelling; the floor
    * is safe because n·pct/100 is a 1/100-grid rational, never within
    * an ulp of an integer from below), kept
    * occurrences of value v = max(0, min(below+cnt, n−trim) −
    * max(below, trim)). Values quantize to exact cents (2-decimal
    * money), so Σ v_cents·kept is an exact integer in any order and
    * the closing two divisions are fixed-shape IEEE — bit-exact.
    * Returns (grp, n, n_kept, trimmed_mean); groups whose band is
    * empty (n ≤ 2·trim) report null. */
  def trimmedMean(df: DataFrame, groupCol: Column, valueCol: Column,
                  trimPct: Int): DataFrame = {
    require(trimPct >= 0 && trimPct < 50)
    val perValue = df.select(groupCol.as("grp"),
        floor(valueCol.cast("double") * 100 + lit(0.5)).cast("long").as("vc"))
      .filter(col("vc").isNotNull)
      .groupBy(col("grp"), col("vc")).agg(count(lit(1)).as("cnt"))
    // below and the group total ride ONE grp-partitioned sort (two
    // frames of the same window) — no checkpoint, no totals join
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("grp")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val trim = floor(col("n").cast("double") * trimPct / 100.0).cast("long")
    val kept = greatest(lit(0L),
      least(col("below") + col("cnt"), col("n") - trim) -
        greatest(col("below"), trim))
    perValue
      .withColumn("below", sum(col("cnt")).over(win) - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(winAll))
      .groupBy(col("grp"), col("n"))
      .agg(sum(col("vc") * kept).as("s"),
        sum(kept).as("n_kept"))
      .select(col("grp"), col("n"), col("n_kept"),
        when(col("n_kept") > 0,
          (col("s").cast("double") / lit(100.0)) /
            col("n_kept").cast("double")).as("trimmed_mean"))
  }

  /** Exact per-group median absolute deviation — the robust SCALE
    * readout next to [[trimmedMean]]'s robust center (outlier gates
    * quote median ± k·MAD where stddev would be poisoned by the very
    * outliers being gated). Two phases of the same distinct-value
    * decomposition: the per-group lower median of the cent-quantized
    * values, then the lower median of |v − med| — every intermediate
    * is an exact integer (absolute deviations of cents are cents), so
    * both medians use the integer half-total rule (2·cum ≥ n) and the
    * only IEEE ops are the final /100 rescales — bit-exact.
    *
    * ADAPTIVE plan choice, the same split [[robustOutliers]] runs on
    * (one bounded-state HLL probe decides):
    *
    *  - distinct cent values per group ≤ `distinctBudget`: TWO corpus
    *    passes — the probe and ONE fused
    *    [[org.apache.spark.sql.graftx.MedianMadAgg]] pass whose
    *    counts-map buffer answers BOTH integer lower medians at eval
    *    (deviations of a sorted array around a fixed center are two
    *    sorted runs — an outward merge, no second map). The two-phase
    *    spelling paid a checkpoint write plus a second corpus read
    *    purely because the deviation column isn't known until the
    *    first median is; the fused buffer IS the distribution, so
    *    both reads collapse into it.
    *  - above the budget: the two-phase distinct-value-table spelling
    *    below — every corpus pass a plain counting agg, window state
    *    bounded by DISTINCT values, never a corpus-sized buffer (the
    *    counts map would hold ~10⁹ entries per group on a continuous
    *    100-TB column and die; the budget sits where 16 B/distinct
    *    stays tens of MB).
    *
    * Both paths are bit-identical (ProfilingSketchSpec pins them on
    * odd/even/duplicate/negative/single-value fixtures and a
    * randomized sweep): same cent quantization, same integer
    * half-total rule, same final /100 rescales. The deviation pass of
    * the fallback re-reads the corpus once (unavoidable: deviations
    * depend on the first pass), but both windows run over
    * DISTINCT-value tables, never corpus rows.
    * Returns (grp, n, v_median, mad). */
  def medianAbsDeviation(df: DataFrame, groupCol: Column,
                         valueCol: Column,
                         distinctBudget: Long = 2000000L): DataFrame = {
    // The REFINED branch spreads + materializes the corpus projection
    // once (below, after the probe decides): both windowed phases then
    // read the same parallel blocks instead of serial re-scans of an
    // under-parallel file. Row order changes; order-independent
    // integer aggregates throughout → bit-identical.
    val baseProj = df.select(groupCol.as("grp"),
        floor(valueCol.cast("double") * 100 + lit(0.5)).cast("long").as("vc"))
      .filter(col("vc").isNotNull)
    // The probe stays its own bounded-state pass, NOT an observe
    // metric on an optimistic fused attempt — the counts-map plan is
    // exactly the one that must not RUN over budget (one buffer entry
    // per distinct value; see robustOutliers' identical reasoning).
    // distinctBudget ≤ 0 pins the windowed path outright (the gated
    // agg_mad_refined twin): the probe's answer is foregone, so the
    // corpus pass it would cost is skipped (empty input included —
    // both paths return the same empty frame).
    val maxDistinct =
      if (distinctBudget <= 0L) Long.MaxValue
      else baseProj.groupBy(col("grp"))
        .agg(approx_count_distinct(col("vc")).as("nd"))
        .collect().iterator.map(_.getAs[Long]("nd")).foldLeft(0L)(math.max)
    if (maxDistinct <= distinctBudget) {
      // fused branch: ONE more pass over the source — the spread's
      // extra shuffle+checkpoint job would buy nothing (measured
      // agg_mad 0.97 s plain vs up to 1.28 s spread at sf0.1), so the
      // spread is paid only on the multi-phase refined branch below.
      return baseProj.groupBy(col("grp"))
        .agg(org.apache.spark.sql.graftx.MedianMadAgg
          .medianMad(col("vc")).as("s"))
        .select(col("grp"), col("s.n").as("n"),
          (col("s.med_c").cast("double") / 100.0).as("v_median"),
          (col("s.mad_c").cast("double") / 100.0).as("mad"))
    }
    // materializeSpread spreads + checkpoints when the scan is
    // under-parallel (its checkpoint doubles as the two-phase
    // checkpoint); at production layouts it is the identity and the
    // explicit checkpoint keeps the r15 behavior.
    val baseRaw = Relational.materializeSpread(baseProj, col("grp"), col("vc"))
    val base =
      if (baseRaw eq baseProj) baseProj.localCheckpoint()
      else baseRaw // already materialized, 2 phases read its blocks
    def lowerMedian(in: DataFrame, out: String): DataFrame = {
      // cum and the group total ride ONE grp-partitioned sort (two
      // frames of the same window) — no checkpoint, no totals join
      import org.apache.spark.sql.expressions.Window
      val pv = in.groupBy(col("grp"), col("vc")).agg(count(lit(1)).as("cnt"))
      val win = Window.partitionBy(col("grp")).orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val winAll = Window.partitionBy(col("grp"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      pv.withColumn("cum", sum(col("cnt")).over(win))
        .withColumn("n", sum(col("cnt")).over(winAll))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("grp"), col("n")).agg(min(col("vc")).as(out))
    }
    val med = lowerMedian(base, "med_c").localCheckpoint() // 2 consumers
    val dev = base.join(med.select(col("grp"), col("med_c")), Seq("grp"))
      .select(col("grp"), abs(col("vc") - col("med_c")).as("vc"))
    med.join(lowerMedian(dev, "mad_c").select(col("grp"), col("mad_c")),
        Seq("grp"))
      .select(col("grp"), col("n"),
        (col("med_c").cast("double") / 100.0).as("v_median"),
        (col("mad_c").cast("double") / 100.0).as("mad"))
  }

  /** The 100-TB form of [[equiDepthHistogram]] for continuous values
    * (V → n kills the exact distinct-value table): ONE KLL sketch over
    * the corpus answers all B boundaries (quantile read-out) and the
    * per-bucket counts (CDF differences scaled by n). One scan, one
    * 1-row aggregate. The CDF read is INCLUSIVE, so bucket 0's lower
    * CDF is pinned to 0 — subtracting rank(min) would silently drop
    * the entire mass tied at the minimum (a heavy-tie column would
    * lose whole buckets); the telescoped depths then re-assemble n
    * exactly up to rank error. ProfilingSketchSpec bounds the depths
    * against the exact histogram, which stays the oracle path. */
  def equiDepthHistogramSketch(df: DataFrame, valueCol: Column,
                               buckets: Int, sketchK: Int = 800): DataFrame = {
    import org.apache.spark.sql.graftx.KllSketch
    val sk = df.select(valueCol.cast("double").as("v"))
      .agg(KllSketch.sketchAgg(col("v"), sketchK).as("__sk"),
        count(col("v")).as("n"))
    sk.select(col("__sk"), col("n"),
        explode(sequence(lit(0), lit(buckets - 1))).as("bucket"))
      .withColumn("lo",
        KllSketch.quantile(col("__sk"), col("bucket").cast("double") / buckets))
      .withColumn("hi",
        KllSketch.quantile(col("__sk"), (col("bucket") + 1).cast("double") / buckets))
      .withColumn("n_rows",
        floor((KllSketch.rank(col("__sk"), col("hi"))
          - when(col("bucket") === 0, lit(0.0))
            .otherwise(KllSketch.rank(col("__sk"), col("lo"))))
          * col("n") + 0.5)
          .cast("long"))
      .select(col("bucket"), col("n_rows"), col("lo"), col("hi"))
  }
}
