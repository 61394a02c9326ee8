package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators mirroring SURVEY §2.3–2.5.
  *
  * Each is a pure DataFrame→DataFrame function, declarative so Catalyst
  * keeps pushdown/pruning/AQE. None collects DATA to the driver; the
  * two prefix-sum decompositions (`contiguousIds`, `orderedPrefixSum`)
  * eagerly collect P per-partition counters — driver traffic bounded by
  * partition count, by design.
  */
object Relational {

  /** The shared "exact Long arithmetic" ceiling for operators whose
    * integer math must not wrap (ksTest's CDF-gap numerator,
    * quantileNormalize's rank product, equiDepthHistogram's bucket
    * product). Sits ~7.7e14 BELOW 2⁶³ = 9.2233720368547758e18, so a
    * double-rounded product comparison (worst-case error a few
    * thousand at this magnitude) can never miss the boundary — the
    * domain given up is negligible and the loud-failure contract is
    * airtight with ~10¹¹× headroom. Injectable per call for tests. */
  private[graft] val ExactIntegerBound = 9.2226e18

  /** Broadcast `df` only while Catalyst's size estimate stays under
    * `maxBytes`; past it, pin a shuffle-hash join so the planner can
    * never broadcast a frame that merely *usually* is small. The
    * standard guard for "dimension-shaped by convention" sides
    * (change feeds, profiles, allowed-set filters): answers identical
    * on both paths, only the join strategy degrades. */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = 8L << 20): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      broadcast(df)
    else df.hint("shuffle_hash")

  /** Decouple scan parallelism from compute parallelism for per-row-
    * compute-heavy stages (regex banks, shingling, tokenization):
    * parquet parallelizes at ROW-GROUP granularity, so a few large
    * single-row-group files serialize all downstream per-row work into
    * as many tasks as there are row groups, regardless of cores. One
    * cheap round-robin exchange fixes that — but ONLY when the scan is
    * actually under-parallel: a production-scale layout already
    * delivers partitions ≥ cores, and an unconditional repartition
    * there would round-robin the ENTIRE corpus through a pure-waste
    * shuffle, so the exchange is gated on the physical partition count.
    *
    * The partition probe (`toRdd.getNumPartitions`) runs ONLY on
    * exchange-free plans, where forcing AQE's final plan executes
    * nothing (raw scans, filters/projections, localCheckpoints). On a
    * plan containing an exchange the probe itself would materialize the
    * upstream shuffle stages — running the job once for the probe and
    * again at execution — and a post-shuffle frame already sits at
    * shuffle parallelism, so such inputs pass through untouched. */
  def computeRebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan // collect/exists do not descend into AQE roots
      case p => p
    }
    val hasExchange = plan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) df
    else if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  /** [[computeRebalance]] + MATERIALIZE, for corpus projections that
    * feed SEVERAL downstream passes (the refined median/MAD shapes):
    * when the scan is under-parallel (a few large single-row-group
    * files — parquet parallelizes at row-group granularity, so every
    * re-scan would serialize into 1-2 effective tasks AND re-decode
    * the file once per pass), spread the rows across the session's
    * shuffle parallelism once and localCheckpoint the result, so each
    * downstream pass is a parallel block read instead of a serial
    * re-scan. At a production layout (scan partitions ≥ cores) this
    * is the IDENTITY — no extra shuffle, no corpus-sized
    * materialization; callers that need multi-pass reuse at scale
    * keep their own explicit checkpoints (`(df eq result)` tells them
    * nothing was materialized). Same probe-safety contract as
    * [[computeRebalance]]: exchange-bearing plans pass through. */
  def materializeSpread(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val hasExchange = plan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) df
    else if (df.queryExecution.toRdd.getNumPartitions < target) {
      // Hash-spread on caller-supplied keys when given: avoids
      // round-robin's sort-before-repartition map pass (SPARK-23207),
      // and downstream groupBys whose keys CONTAIN the spread keys
      // reuse the partitioning — their exchange disappears. Callers
      // pick high-cardinality keys (the distinct-value tuple); a
      // degenerate single-value column merely reproduces the
      // single-task behavior this helper replaces. No keys =
      // round-robin.
      val spread =
        if (keys.nonEmpty) df.repartition(target, keys: _*)
        else df.repartition(target)
      spread.localCheckpoint()
    } else df
  }

  /** A constant window-partition key the optimizer CANNOT fold away,
    * for windows that deliberately run on one partition because their
    * frame is bounded-small (a vocabulary head, a size histogram —
    * never corpus-sized). `partitionBy(lit(0))` does not work: Spark's
    * `EliminateWindowPartitions` rule strips foldable partition keys
    * (and zero-product simplification catches `hash(col) * 0`),
    * leaving an empty physical spec and the "No Partition Defined"
    * warning the literal was meant to avoid. The opaque fence keeps
    * the constant un-foldable, so the spec survives to the physical
    * plan. */
  def singlePartitionKey(): Column =
    org.apache.spark.sql.graftx.ArrayNumeric.opaque(lit(0))

  /** Top-k rows per group with a deterministic total order (SURVEY A5/W4;
    * reference arg-max clade pick: berdl/berdl/prep_genome_set.py:160-169).
    *
    * One shuffle on `partitionCols`; at scale the window's rank stops
    * scanning after k per group (Spark inserts a group-limit for
    * row_number filters).
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** First-wins keyed merge (SURVEY J8; reference ANI-source merge with
    * source-order conflict policy: datalake_table.py:216-257).
    *
    * Sources are ranked by position; for each key the row from the
    * earliest source wins. Encoded as an explicit priority column +
    * window so the result is deterministic under parallelism.
    */
  def firstWinsMerge(sources: Seq[DataFrame], keys: Seq[String],
                     tieBreak: Seq[Column] = Nil): DataFrame = {
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.withColumn("__priority", lit(i))
    }
    val all = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__priority") +: tieBreak: _*)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__priority")
  }

  /** Core-membership flag (SURVEY A2; reference core-gene test:
    * build_berdl_db.py:553-556): a cluster is core iff its distinct
    * member count equals the global distinct member count.
    *
    * The global count is a 1-row aggregate — broadcast-joined (cross)
    * so the per-cluster side never reshuffles.
    */
  def coreFlag(df: DataFrame, cluster: String, member: String): DataFrame = {
    val perCluster = df.groupBy(col(cluster))
      .agg(countDistinct(col(member)).as("n_members"))
    val global = df.agg(countDistinct(col(member)).as("__n_global"))
    perCluster.crossJoin(broadcast(global))
      .withColumn("is_core", col("n_members") === col("__n_global"))
      .drop("__n_global")
  }

  /** Priority-max aggregation (SURVEY A8; reference most-constrained
    * FVA class fold: KBDatalakeUtils.py:1113-1147). Maps each value to
    * an integer priority, takes max per group, maps back — pure
    * expressions, codegen-friendly, map-side partial agg applies.
    */
  def priorityMax(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  priority: Seq[(String, Int)], as: String): DataFrame = {
    val toPriority = priority.foldLeft(lit(0)) { case (acc, (v, p)) =>
      when(col(valueCol) === v, lit(p)).otherwise(acc)
    }
    val fromPriority = priority.foldLeft(lit(null).cast("string")) {
      case (acc, (v, p)) => when(col("__p") === p, lit(v)).otherwise(acc)
    }
    df.withColumn("__p0", toPriority)
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__p0")).as("__p"))
      .withColumn(as, fromPriority)
      .drop("__p")
  }

  /** Deterministic pagination (SURVEY W1; the reference's HTTP surface
    * pages every query with {limit, offset}: query_pangenome_berdl.py:99-125).
    * Callers must pass a total order (include a unique tie-break column).
    */
  def page(df: DataFrame, order: Seq[Column], limit: Int, offset: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)

  /** Keyset (cursor) pagination — the serving form that survives deep
    * scrolling at 100 TB: `page(offset=N)` must order-and-discard N
    * rows to serve page N+1, while the keyset form filters
    * `(k1, k2) > (after1, after2)` FIRST — a pushdown-eligible
    * predicate — and TakeOrdered's per-partition heaps keep only
    * `limit` rows each. Cursor = the last row's values of the
    * (ascending, totally-ordering) key columns; the tuple comparison
    * is expanded to the strict lexicographic form so each conjunct
    * can reach the scan. */
  def keysetPage(df: DataFrame, keys: Seq[(Column, Column)],
                 limit: Int): DataFrame = {
    val after = keys.indices.map { i =>
      val eqPrefix = keys.take(i).map { case (k, a) => k === a }
      val strict = keys(i) match { case (k, a) => k > a }
      (eqPrefix :+ strict).reduce(_ && _)
    }.reduce(_ || _)
    df.filter(after).orderBy(keys.map(_._1): _*).limit(limit)
  }

  /** Dynamic long→wide pivot with deterministic, bounded pivot values
    * (SURVEY §1.3 dynamic ontology columns: datalake_table.py:310-316;
    * §7.4 hard-part 1: "collect distinct terms, sort, cap with
    * overflow column").
    *
    * Two-pass like the reference: discover the distinct pivot values
    * (sorted, capped — a TakeOrdered of at most `maxValues + 1`
    * strings, so the driver never holds an unbounded term set), then
    * pivot with the explicit list so the plan is stable and the
    * shuffle is a single groupBy.
    *
    * When the data exceeds the cap: with `overflowCol` set, the first
    * `maxValues` values (sorted ascending) become columns and every
    * remaining value is remapped into the single `overflowCol` column
    * (the agg then runs over the combined overflow group); with no
    * `overflowCol` the pivot refuses loudly instead of silently
    * widening to an unbounded schema.
    */
  def dynamicPivot(df: DataFrame, keys: Seq[String], pivotCol: String,
                   agg: Column, maxValues: Int = 1000,
                   overflowCol: Option[String] = None): DataFrame = {
    val pv = col(pivotCol).cast("string")
    // NULL pivot values are excluded from discovery and contribute to
    // no column (their groups' key rows still appear): a NULL would
    // otherwise sort first and claim a kept slot as a phantom column,
    // while `isin(kept)` — never true for NULL — folded its rows into
    // the overflow bucket.
    val discovered = df.select(pv.as("__pv")).distinct()
      .filter(col("__pv").isNotNull)
      .orderBy(col("__pv")).limit(maxValues + 1)
      .collect().map(_.getString(0)).toSeq
    if (discovered.size <= maxValues)
      df.groupBy(keys.map(col): _*).pivot(pivotCol, discovered).agg(agg)
    else overflowCol match {
      case None =>
        throw new IllegalArgumentException(
          s"pivot values for $pivotCol exceed cap $maxValues " +
            "(pass overflowCol to route the excess into one column)")
      case Some(other) =>
        val kept = discovered.take(maxValues)
        require(!kept.contains(other),
          s"overflow column name '$other' collides with a pivot value")
        // NULLs map to a sentinel OUTSIDE the pivot list, so they
        // contribute to no column — same semantics as the uncapped
        // path (a real string equal to the sentinel is unaffected:
        // it hits the isin/overflow branches first).
        val remapped = df.withColumn("__pivot_val",
          when(pv.isNull, lit("__pivot_null__"))
            .when(pv.isin(kept: _*), pv)
            .otherwise(lit(other)))
        remapped.groupBy(keys.map(col): _*)
          .pivot("__pivot_val", kept :+ other).agg(agg)
    }
  }

  /** Set-collect rendered to a deterministic `;`-joined string (SURVEY
    * A7; reference `'; '.join(sorted(set(...)))`: KBDatalakeUtils.py:1136-1147).
    * Arrays internally, string only at the edge (SURVEY §1.2). */
  def sortedSetJoin(c: Column, sep: String = ";"): Column =
    concat_ws(sep, array_sort(collect_set(c)))

  /** Strand-aware coordinate conversion, KBase location variant
    * (reference: datalake_table.py:16-23): `(p0, strand, len)` →
    * (start, end); on '-' the anchor is the high coordinate. */
  def strandCoords(p0: Column, strand: Column, len: Column): (Column, Column) = {
    val start = when(strand === "-", p0 - len + 1).otherwise(p0)
    val end   = when(strand === "-", p0).otherwise(p0 + len - 1)
    (start, end)
  }

  /** Strand-aware coordinate swap, TSV variant (reference:
    * datalake_table.py:430-437): swap start/end when strand is '-'. */
  def strandSwap(start: Column, end: Column, strand: Column): (Column, Column) =
    (when(strand === "-", end).otherwise(start),
     when(strand === "-", start).otherwise(end))

  /** Banded range join: all (left, right) pairs with the same key and
    * |left.ts − right.ts| ≤ window. The theta condition is turned into
    * an equi-join by time-banding: band width = window, the right side
    * replicated to its band ±1 (any in-range partner's band differs by
    * at most 1), exact predicate applied after the equi-match. Shuffles
    * on (key, band) — O(matches) work instead of the O(|L|·|R|)-per-key
    * blowup of a raw theta join. Replication factor is a constant 3. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                window: Long): DataFrame = {
    // integer `div`, not floor(x/y): double division loses exactness
    // past 2^53 (e.g. epoch-nanos timestamps)
    val l = left.withColumn("__band", expr(s"$ts div ${window}L"))
    val rBase = right.withColumnRenamed(ts, s"r_$ts")
    val rBand = expr(s"r_$ts div ${window}L")
    val r = rBase.withColumn("__band",
      explode(array(rBand - 1, rBand, rBand + 1)))
    l.join(r, Seq(key, "__band"))
      .filter(abs(col(ts) - col(s"r_$ts")) <= window)
      .drop("__band")
  }

  /** As-of join: each left row picks the LATEST right row with
    * `right.ts <= left.ts` for the same key (the temporal-lookup join
    * the reference lacks but a metrics/event lakehouse needs).
    *
    * Formulated as union + running `last_value` instead of a range
    * join: a range condition would explode to O(|L|·|R|) per key before
    * filtering, while this is one shuffle on the key and one ordered
    * window pass — the formulation that survives 100× data. Right rows
    * sort before left rows on ts ties (the ASOF `<=` convention).
    *
    * Left columns pass through; the right's `valueCols` arrive as
    * `asof_<name>` (null when nothing precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumns(valueCols.map(c => s"asof_$c" -> lit(null)).toMap)
    val r = valueCols.foldLeft(right.withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(s"asof_$c", col(c))
    }.select((col(key) +: col(ts) +: col("__side") +:
      valueCols.map(c => col(s"asof_$c"))): _*)
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(combined) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Contiguous 0..n−1 ids in `order`-order WITHOUT the single-partition
    * global window `row_number() OVER (ORDER BY …)` plans to — on a
    * 100 TB table that window funnels every row through ONE task. Here
    * the global order is decomposed into (range partition, within-
    * partition rank, partition offset):
    *
    *  1. range-partition on `order` + within-partition local sort (the
    *     same shape a global sort plans — P parallel sorted runs, no
    *     single task),
    *  2. the within-partition record index — P independent parallel
    *     counters, no exchange,
    *  3. per-partition row counts (one partial-agg job over the pinned
    *     frame, P rows to the driver — bounded by partition count, not
    *     data) prefix-summed into start offsets and re-entered as a
    *     map literal, so `id = offset(pid) + local_index`.
    *
    * Step 2 rides `monotonically_increasing_id()`'s documented layout
    * (partition id ≪ 33 | within-partition record index) over the
    * CHECKPOINTED sorted partitions, so no window, no within-partition
    * re-sort, and — unlike a `row_number() OVER (PARTITION BY pid)`
    * formulation — no second exchange to re-cluster what the range
    * exchange already clustered. The `localCheckpoint` pins partition
    * ids and iteration order so the count pass and the final pass see
    * the same layout and the range shuffle runs once. `order` must be
    * a total order (include a unique tiebreaker) or ids are
    * nondeterministic within ties. Bound: < 2³³ rows per range
    * partition (the record-index field width — also
    * monotonically_increasing_id's own limit). */
  def contiguousIds(df: DataFrame, order: Seq[Column],
                    idName: String = "seq_id"): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val counts = ranged.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid + 1, acc + c)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offMap = map(offsets.flatMap { case (pid, off) =>
      Seq(lit(pid), lit(off)) }.toSeq: _*)
    ranged
      .withColumn(idName,
        element_at(offMap, spark_partition_id()) +
          (monotonically_increasing_id() bitwiseAND ((1L << 33) - 1)))
  }

  /** Exact ordered prefix sum — the weighted generalization of
    * [[contiguousIds]] (which is the weight-1 case): running total of
    * `weight` in `order`-order, without the single-partition global
    * window `sum() OVER (ORDER BY …)` plans to. Range partition +
    * local sort + checkpoint, per-partition totals prefix-summed on
    * the driver (P longs), then a per-partition running-sum window.
    * Unlike contiguousIds the within-partition RUNNING SUM cannot ride
    * the record index, so this pays one pid-hash exchange for the
    * window's clustering — two narrow shuffles total, still no
    * single-task stage. `order` must be a total order; `weight` must
    * be a non-null integral column (exact long arithmetic end-to-end).
    * Appends `outCol` = inclusive running total. */
  def orderedPrefixSum(df: DataFrame, order: Seq[Column], weight: Column,
                       outCol: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__w", weight.cast("long"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("__w")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid + 1, acc + s)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offMap = map(offsets.flatMap { case (pid, off) =>
      Seq(lit(pid), lit(off)) }.toSeq: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(outCol,
        element_at(offMap, col("__pid")) + sum(col("__w")).over(w))
      .drop("__pid", "__w")
  }

  /** Exact percentile-rank normalization of `scoreCol` (the quality-
    * score → corpus-percentile map a curation pipeline thresholds on):
    * `pct = |{rows with score < s}| / (n − 1)` — the `percent_rank()`
    * value, without `percent_rank() OVER (ORDER BY score)`'s single
    * row-bounded partition. The global order collapses to the DISTINCT
    * VALUE table: one partial-agg groupBy (V rows, V = distinct scores
    * ≪ n for discrete scores), a value-bounded running-sum window over
    * it, and a broadcast-guarded join back. At 100 TB with a truly
    * continuous score, V approaches n — use the KLL CDF surface
    * (`kll_rank`) there; this is the exact path for bounded-V scores.
    * Appends `<outCol>` (raw 0..1 double) — callers round for
    * engine-portable output. Null scores drop (the join-back is inner
    * on the score, matching `percent_rank`'s null-excluding order). */
  def percentileRank(df: DataFrame, scoreCol: String,
                     outCol: String = "pct_rank"): DataFrame = {
    // Null scores are excluded from BOTH the below-counts and n (they
    // already drop from the output via the inner join-back) — without
    // this filter a null group sorts first and inflates every rank.
    // The V-row count table CHECKPOINTS (the broadcast side would
    // otherwise re-derive it from a second corpus scan; the total also
    // reads it in the parallel aggregation — an unbounded-frame window
    // total would re-buffer all V rows serially inside the one GLOBAL
    // window task, the trade measured on ksTest).
    val counts = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val vw = Window.partitionBy(singlePartitionKey()).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = counts.agg(sum(col("__c")).as("__n"))
    val withN = counts
      .withColumn("__below", sum(col("__c")).over(vw) - col("__c"))
      .crossJoin(broadcast(n))
      .withColumn(outCol,
        col("__below").cast("double") / (col("__n") - 1).cast("double"))
      .select(col(scoreCol), col(outCol))
    // Value-bounded by construction (V rows), so broadcast outright —
    // stats on the windowed plan are too pessimistic for the auto path.
    df.join(broadcast(withN), Seq(scoreCol))
  }

  /** Cross-source QUANTILE NORMALIZATION of `scoreCol` — map each
    * source's score distribution onto the GLOBAL score distribution,
    * so scores from sources with incompatible scorers (one length
    * heuristic, one model logit, one human rubric) become directly
    * comparable before global filtering or mixing. For a row of
    * source s with score v: p = r/n_s (r = rank of v's LAST tied
    * occurrence within s), and the normalized score is the global
    * value holding rank ⌈p·N⌉ — all INTEGER arithmetic
    * (t = (r·N + n_s − 1) div n_s), so the map is exact and
    * engine-portable with no float rank anywhere. A single-source
    * input maps to itself (t lands back on v's own global range) —
    * the identity law PropertySpec pins.
    *
    * Scale shape: the corpus reduces ONCE to the per-(source, value)
    * count table; per-source ranks are a window over that table
    * (partitioned by source) and the global CDF a second value-bounded
    * window (same explicit single-partition key as
    * [[percentileRank]], V rows, never corpus rows). The rank lookup
    * t ∈ [lo, hi] is a BUCKETED equi join: each global range row
    * explodes to its ⌈span/rankBucket⌉ covering buckets (ΣN/B + V
    * rows total) and each source row probes its single bucket — never
    * a non-equi nested loop (PlanGuardSpec pins it). The (source,
    * value → norm) map is value-bounded and broadcasts back.
    *
    * Same exact-integer bound as ksTest: r·N must stay under 2⁶³ —
    * the plan carries a raise_error guard (injectable for tests) and
    * fails loudly past it (pre-bin or sample there). Null sources or
    * scores drop (the join-back is inner). Appends `<outCol>`. */
  def quantileNormalize(df: DataFrame, sourceCol: String, scoreCol: String,
                        outCol: String = "norm_score",
                        rankBucket: Long = 4096L,
                        overflowBound: Double = ExactIntegerBound): DataFrame = {
    require(rankBucket >= 1)
    val pv = df.filter(col(scoreCol).isNotNull && col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("__src"), col(scoreCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // V-row table: feeds source ranks AND global CDF
    val sw = Window.partitionBy(col("__src")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srcTot = pv.groupBy(col("__src")).agg(sum(col("__c")).as("__ns"))
    val ranked = pv.withColumn("__r", sum(col("__c")).over(sw))
      .join(broadcast(srcTot), Seq("__src")) // source-count-sized
    val gw = Window.partitionBy(singlePartitionKey()).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = pv.groupBy(col("__v")).agg(sum(col("__c")).as("__gc"))
      .withColumn("__hi", sum(col("__gc")).over(gw))
      .withColumn("__lo", col("__hi") - col("__gc") + 1)
      .localCheckpoint() // feeds the bucket spans AND the total
    val nTot = g.agg(max(col("__hi")).as("__n"))
    // Guard (r+1)·N, not r·N: the computed numerator is r·N + ns − 1
    // and ns ≤ N, so (r+1)·N bounds it from above — a guard on the
    // bare product would pass while the +ns−1 tail wraps.
    val targets = ranked.crossJoin(broadcast(nTot))
      .withColumn("__t",
        when((col("__r").cast("double") + lit(1.0)) *
          col("__n").cast("double") >= lit(overflowBound),
          raise_error(lit("quantileNormalize: (r+1)*N exceeds the " +
            "exact-integer bound — pre-bin or sample first")))
          .otherwise(expr("(__r * __n + __ns - 1) div __ns")))
    val spans = g.select(col("__v").as("__gv"), col("__lo"), col("__hi"),
      explode(sequence(expr(s"(__lo - 1) div ${rankBucket}"),
        expr(s"(__hi - 1) div ${rankBucket}"))).as("__bkt"))
    val mapped = targets
      .withColumn("__bkt", expr(s"(__t - 1) div ${rankBucket}"))
      .join(spans, Seq("__bkt"))
      .filter(col("__t") >= col("__lo") && col("__t") <= col("__hi"))
      .select(col("__src").as(sourceCol), col("__v").as(scoreCol),
        col("__gv").as(outCol))
    // value-bounded map (one row per surviving (source, value))
    df.join(broadcast(mapped), Seq(sourceCol, scoreCol))
  }
}
