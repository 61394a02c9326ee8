package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (corpus mixing,
  * per-source quotas). All hash-threshold based: a row is kept iff
  * `hash(id) mod D < rate·D` — reproducible across runs, engines, and
  * cluster sizes (no RNG state, no partition sensitivity), and a pure
  * narrow filter at any scale. The hash is the md5-prefix construction
  * shared with the minhash family so the SQL oracle replays it exactly.
  */
object Sampling {

  private val Denominator = 10000L

  /** Uniform keep-hash in [0, 10000) from the row id. */
  def keepHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") % Denominator

  /** Deterministic uniform sample: keep ~`rate` of rows. */
  def uniformSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(keepHash(col(idCol)) < (rate * Denominator).toLong)

  /** Error-bounded approximate aggregation (AQP) over the
    * deterministic Bernoulli(p) hash sample: per group, the
    * Horvitz-Thompson total estimate T̂ = Σ_{i∈S} v_i / p with its
    * estimated standard error sqrt(Σ_{i∈S} v_i² · (1−p)/p²) — the
    * profile-a-100-TB-fact-from-the-1%-it-touches readout, WITH the
    * confidence band that makes the estimate trustworthy. The sample
    * is the same md5 keep-hash as [[uniformSample]], so the estimate
    * is replayable and engine-exact: values become INTEGER units on
    * the 2⁻⁸ grid, so Σu (long) and Σu² (decimal — u² alone can reach
    * 2⁵⁰) are exact integers in ANY accumulation order; the divisions
    * and sqrt are then fixed-shape IEEE on the identical (correctly-
    * rounded) doubles both engines derive from those integers. A
    * double sum of v or v·v would NOT be order-independent here — v
    * reaches 2¹⁷, so v² products round and Spark's partial aggs could
    * disagree with a sequential engine in the low bits. At rate=1 the
    * estimate IS the exact total and stderr is 0 (PropertySpec pins
    * both). */
  def aqpGroupSum(df: DataFrame, idExpr: Column, keyCol: Column,
                  valCol: Column, rate: Double): DataFrame = {
    require(rate > 0 && rate <= 1)
    val keep = (rate * Denominator).toLong
    val pd = keep.toDouble / Denominator
    val grid = 256.0 // 2^8: units small enough that u*u stays exact
    val s = df.filter(keepHash(idExpr) < keep)
      .select(keyCol.as("grp"),
        floor(valCol.cast("double") * grid + lit(0.5)).cast("long").as("u"))
    val u2 = col("u").cast("decimal(38,0)") * col("u").cast("decimal(38,0)")
    s.groupBy(col("grp")).agg(
      count(lit(1)).as("n_sampled"),
      (sum(col("u").cast("decimal(38,0)")).cast("double") / grid / pd)
        .as("est_sum"),
      sqrt(sum(u2).cast("double") / (grid * grid) * ((1.0 - pd) / (pd * pd)))
        .as("stderr"))
  }

  /** Deterministic negative sampling for contrastive training: for
    * each anchor, `k` corpus rows drawn by the engine-portable hash
    * `md5(anchor:j) mod |corpus|` (j = 1..overdraw·k candidate slots),
    * excluding the anchor itself and any candidate sharing its
    * `labelCol` (the positives), first k distinct survivors in slot
    * order. Fully replayable — same corpus, same negatives — which is
    * what makes a training run reproducible and the oracle exact.
    *
    * Scale shape: candidates materialize as (anchor, candidate_id)
    * keys — k·overdraw rows per anchor — and resolve through ONE hash
    * equi-join against the corpus; no per-anchor scan, no cartesian.
    * Ids must be dense 0..n-1 (the export convention; `zipWithIndex`-
    * style densification upstream otherwise). */
  def negativeSample(corpus: DataFrame, idCol: String, labelCol: String,
                     k: Int, overdraw: Int = 3): DataFrame = {
    require(k > 0 && overdraw > 0)
    import org.apache.spark.sql.expressions.Window
    val n = corpus.select(count(lit(1)).as("__n"))
    val anchors = corpus.select(col(idCol).as("anchor_id"),
      col(labelCol).as("__alabel"))
    val cands = anchors.crossJoin(broadcast(n))
      .select(col("anchor_id"), col("__alabel"), col("__n"),
        explode(sequence(lit(1), lit(k * overdraw))).as("j"))
      .withColumn("cand_id",
        conv(substring(md5(concat(col("anchor_id").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 15), 16, 10).cast("long") % col("__n"))
      .filter(col("cand_id") =!= col("anchor_id"))
      .groupBy(col("anchor_id"), col("__alabel"), col("cand_id"))
      .agg(min(col("j")).as("j")) // dedup repeated draws, keep first slot
    val resolved = cands.join(
      corpus.select(col(idCol).as("cand_id"), col(labelCol).as("__clabel")),
      Seq("cand_id"))
      .filter(col("__clabel") =!= col("__alabel"))
    val w = Window.partitionBy(col("anchor_id")).orderBy(col("j"), col("cand_id"))
    resolved.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("cand_id").as("negative_id"))
  }

  /** Deterministic per-key quota — the crawl-curation "at most `cap`
    * documents per domain/source" rule: rows rank inside each key by
    * the uniform keep-hash (id tiebreak), ranks ≤ cap survive. The
    * hash ranking makes the kept set a uniform sample of each key's
    * rows and stable under reruns.
    *
    * Scale shape: a single rank window would funnel EVERY row of a hot
    * domain into one task (the classic quota-skew failure at crawl
    * scale, where one domain can be 10⁸ pages). Ranking here is
    * two-phase: a salted local top-cap per (key, salt-of-id) bounds
    * any key's survivors at cap·`salts` rows, then an exact top-cap
    * window runs over just those survivors — same ordering both
    * phases, so the final set is exactly the single-window answer
    * (the global top-cap is a subset of every salt bucket's local
    * top-cap). The salt is derived from the id, so the plan stays
    * deterministic and replayable. */
  def perKeyCap(df: DataFrame, keyCol: String, idCol: String, cap: Int,
                salts: Int = 16): DataFrame = {
    require(cap > 0 && salts > 0)
    import org.apache.spark.sql.expressions.Window
    def order(w: org.apache.spark.sql.expressions.WindowSpec) =
      w.orderBy(keepHash(col(idCol)).asc, col(idCol).asc)
    val w1 = order(Window.partitionBy(col(keyCol),
      pmod(xxhash64(col(idCol)), lit(salts))))
    val w2 = order(Window.partitionBy(col(keyCol)))
    df.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= cap)
      .withColumn("__r2", row_number().over(w2)).filter(col("__r2") <= cap)
      .drop("__r1", "__r2")
  }

  /** Deterministic weighted corpus mix: given named sources and target
    * mixture weights, keep the largest total corpus that realizes the
    * exact mixture — T = min over sources of n_s/w_s rows in total,
    * each source hash-sampled down to T·w_s of its n_s rows. The only
    * driver work is one count per source (an agg, not a collect); the
    * sample itself is the same narrow hash-threshold filter as
    * `uniformSample`, so the mix is reproducible at any scale and the
    * bottleneck source is used in full.
    *
    * Returns the union of the sampled sources with a `mix_source`
    * provenance column. */
  def weightedMix(sources: Seq[(String, DataFrame, Double)],
                  idCol: String): DataFrame = {
    require(sources.nonEmpty && sources.forall(_._3 > 0))
    val counted = sources.map { case (name, df, w) => (name, df, w, df.count()) }
    val total = counted.map { case (_, _, w, n) => n / w }.min
    counted.map { case (name, df, w, n) =>
      // exact op order mirrored in the SQL oracle: (total*w/n)*D, floor
      val threshold = (total * w / n * Denominator).toLong
      df.filter(keepHash(col(idCol)) < threshold)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Deterministic weighted (e.g. length-proportional) Poisson sample:
    * row kept with probability `expected·w/W` (W = total weight), i.e.
    * iff `keepHash(id)·W < expected·w·D`. All-integer arithmetic — no
    * pow/ln, whose libm rounding differs across engines — so the SQL
    * oracle replays the keep set bit-exactly. The weight total is an
    * in-plan 1-row broadcast (an agg, not a collect); the sample itself
    * stays a narrow filter. Weights must be non-negative integers
    * (token counts, byte sizes); `expected` is the target sample size
    * in rows.
    *
    * Exactness bound, enforced IN-PLAN (raise_error on the 1-row agg,
    * no driver round-trip): both comparison sides must stay within
    * Long — `sum(weight) <= Long.Max/10⁴` (~9.2e14, e.g. a ~900 TB
    * byte-weighted corpus) and `expected·max(weight) <= Long.Max/10⁴`.
    * Beyond that the old code silently wrapped and corrupted the keep
    * set; now the job fails with the measured totals in the message —
    * callers at that scale should pre-scale weights (e.g. KiB instead
    * of bytes). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     expected: Long): DataFrame = {
    require(expected > 0, s"expected must be positive, got $expected")
    val safeCap = Long.MaxValue / Denominator
    val tot = df.agg(sum(col(weightCol)).cast("long").as("__w_total"),
      max(col(weightCol)).cast("long").as("__w_max"))
    val guarded = tot.select(
      when(col("__w_total") > safeCap || col("__w_max") > safeCap / expected,
        raise_error(concat(
          lit("weightedSample exact-integer overflow: sum(weight)="),
          col("__w_total").cast("string"),
          lit(" or expected*max(weight) with max(weight)="),
          col("__w_max").cast("string"),
          lit(s" exceeds ${Long.MaxValue}/$Denominator; pre-scale the weights"))))
        .otherwise(col("__w_total")).as("__w_total"))
    df.crossJoin(broadcast(guarded))
      .filter(keepHash(col(idCol)) * col("__w_total") <
        lit(expected) * col(weightCol).cast("long") * lit(Denominator))
      .drop("__w_total")
  }

  /** Leakage-proof split assignment: rows sharing a group key (e.g. a
    * near-dup cluster id) hash to the SAME split, so an eval split can
    * never contain a near-duplicate of a training row — the
    * contamination mode plain row-wise splitting can't prevent. Pure
    * narrow expression over the group key; `cuts` are cumulative
    * upper bounds (exclusive) out of 10000, last entry is the rest. */
  def groupedSplit(groupKey: Column, cuts: Seq[(String, Long)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == Denominator,
      s"cuts must end at $Denominator")
    val h = keepHash(groupKey)
    cuts.init.reverse.foldLeft(lit(cuts.last._1): Column) {
      case (acc, (name, ub)) => when(h < ub, lit(name)).otherwise(acc)
    }
  }

  /** Deterministic stratified sample: per-stratum keep rates (corpus
    * mixing weights), default rate for unlisted strata. One narrow
    * filter — no shuffle, no driver round-trip, any scale. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Denominator).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * Denominator).toLong)).otherwise(acc)
    }
    df.filter(keepHash(col(idCol)) < threshold)
  }

  /** Exact greedy token-budget selection — "take the best documents
    * until the token budget is spent", the curation step that turns a
    * scored corpus into a fixed-size training set. The greedy order is
    * (score DESC, keepHash(id), id): the hash jitter makes ties inside
    * a coarse score (quality rubrics emit a handful of levels) an
    * unbiased uniform draw instead of an id-order artifact. A row is
    * kept iff the running token total up to and including it fits the
    * budget (= `frac` of the corpus's total tokens).
    *
    * Scale shape: the naive form is ONE global cumulative-sum window —
    * every row through a single task. Here the cumsum is split
    * hierarchically: per-bin token totals (bin = (score, jitter), a
    * partial-agg groupBy) feed a prefix-sum window over the BIN DOMAIN
    * (bounded: |score levels| x 10^4 jitter values, independent of row
    * count — the only single-partition step), and each row only needs
    * its WITHIN-bin running sum (a window partitioned by bin, max task
    * = max bin size ~ n/|bins|). `cum_before(bin) + within_cum(row)`
    * reassembles the exact global running total, so the kept set is
    * bit-identical to the single-window answer the oracle runs. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(scoreCol).as("__score"),
      keepHash(col(idCol)).as("__jit"),
      col(tokensCol).cast("long").as("__tok"))
      .localCheckpoint() // feeds the bin agg AND the final pass
    val budget = base.agg(
      floor(sum(col("__tok")) * frac).cast("long").as("__budget"))
    val bins = base.groupBy(col("__score"), col("__jit"))
      .agg(sum(col("__tok")).as("__bin_tok"))
    // explicit single-partition key (opaque: survives
    // EliminateWindowPartitions): the frame is the bounded BIN domain,
    // never corpus rows — see Relational.singlePartitionKey
    val overBins = Window.partitionBy(Relational.singlePartitionKey())
      .orderBy(col("__score").desc, col("__jit").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val binsCum = bins
      .withColumn("__cum_before",
        coalesce(sum(col("__bin_tok")).over(overBins), lit(0L)))
      .select(col("__score"), col("__jit"), col("__cum_before"))
    val within = Window.partitionBy(col("__score"), col("__jit"))
      .orderBy(col(idCol).asc)
    base.withColumn("__wcum", sum(col("__tok")).over(within))
      .join(broadcast(binsCum), Seq("__score", "__jit"))
      .crossJoin(broadcast(budget))
      .filter(col("__cum_before") + col("__wcum") <= col("__budget"))
      .select(col(idCol), col("__score").as(scoreCol),
        col("__tok").as(tokensCol),
        (col("__cum_before") + col("__wcum")).as("cum_tokens"))
  }
}
