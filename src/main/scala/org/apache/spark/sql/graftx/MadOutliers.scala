package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.util.collection.OpenHashMap

/** EXACT fused MAD + outlier count over a deviation column, in ONE
  * aggregation: the per-group buffer is the same value→count map an
  * exact `percentile` holds, but `eval` answers BOTH the interpolated
  * median of the deviations (the MAD) AND the count of deviations
  * beyond `k`·MAD from that same buffer — where the two-aggregation
  * spelling pays a second corpus pass (join the MAD back, re-scan,
  * count) purely because the threshold isn't known until the median
  * is. Fusing is sound because the counts map IS the full deviation
  * distribution: once sorted for the median, the tail count is a walk
  * over the same keys.
  *
  * Exactness contract (pinned by ProfilingSketchSpec against the
  * two-pass spelling): the median interpolation is bit-identical to
  * Spark's `percentile(dev, 0.5)` — position p = 0.5·(n−1), result =
  * (⌈p⌉ − p)·lo + (p − ⌊p⌋)·hi over the expanded sorted multiset — and
  * the outlier predicate is Spark SQL's double `>` — SQLOrderingUtil
  * semantics, NOT the JVM primitive: primitive-equal values compare
  * equal (so -0.0 ≯ 0.0), everything else falls to Double.compare's
  * total order where NaN is GREATEST — so a NaN deviation in a group
  * whose MAD is finite and positive IS an outlier, exactly as the
  * two-aggregation SQL spelling (mad > 0 AND dev > mad·k OR mad = 0
  * AND dev > 0) counts it. Null deviations (null
  * input values) count in `n_rows`, are invisible to the median, and
  * are never outliers; an all-null group reports a null MAD. Buffer
  * state is one entry per DISTINCT deviation — callers route here
  * only under the same distinct-values budget that gates the exact
  * counts-map percentile (Profiling.robustOutliers).
  *
  * Returns struct(mad, n_outliers, n_rows). */
case class MadOutliersAgg(child: Expression, k: Double,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MadOutliersAgg.Buf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("mad", DoubleType, nullable = true),
    StructField("n_outliers", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MadOutliersAgg.Buf =
    new MadOutliersAgg.Buf(new OpenHashMap[Long, Long](), 0L)

  override def update(buf: MadOutliersAgg.Buf,
                      input: InternalRow): MadOutliersAgg.Buf = {
    val v = child.eval(input)
    if (v == null) buf.nulls += 1
    // keyed on doubleToLongBits, NOT the primitive double: primitive
    // NaN != NaN would insert a NEW entry per NaN row (unbounded
    // state, quadratic probing on identical hashes), while the bits
    // canonicalize every NaN to one key and keep -0.0/0.0 distinct —
    // exactly the boxed-Double key semantics Spark's own percentile
    // buffer has
    else buf.counts.changeValue(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L, _ + 1L)
    buf
  }

  override def merge(buf: MadOutliersAgg.Buf,
                     other: MadOutliersAgg.Buf): MadOutliersAgg.Buf = {
    other.counts.foreach { case (bits, cnt) =>
      buf.counts.changeValue(bits, cnt, _ + cnt)
    }
    buf.nulls += other.nulls
    buf
  }

  override def eval(buf: MadOutliersAgg.Buf): Any = {
    var n = 0L
    buf.counts.foreach { case (_, c) => n += c }
    if (n == 0L) return InternalRow(null, 0L, buf.nulls)
    val (vs, cs) = MadOutliersAgg.sortedPairs(buf.counts)
    val mad = MadOutliersAgg.interpolatedMedian(vs, cs, n)
    val outliers = MadOutliersAgg.fenceTail(vs, cs, mad, k)
    InternalRow(mad, outliers, n + buf.nulls)
  }

  override def serialize(buf: MadOutliersAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + buf.counts.size * 16)
    bb.putLong(buf.nulls)
    bb.putInt(buf.counts.size)
    buf.counts.foreach { case (bits, c) =>
      bb.putLong(bits); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): MadOutliersAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val nulls = bb.getLong
    val sz = bb.getInt
    val m = new OpenHashMap[Long, Long](math.max(sz, 1))
    var i = 0
    while (i < sz) { m.update(bb.getLong, bb.getLong); i += 1 }
    new MadOutliersAgg.Buf(m, nulls)
  }

  override def withNewMutableAggBufferOffset(o: Int): MadOutliersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MadOutliersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MadOutliersAgg =
    copy(child = c)
  override def prettyName: String = "mad_outliers"
}

object MadOutliersAgg {
  /** Mutable aggregation state: deviation→count plus the null tally. */
  final class Buf(val counts: OpenHashMap[Long, Long], var nulls: Long)

  /** struct(mad, n_outliers, n_rows) of a deviation column at fence
    * multiplier `k`. */
  def madOutliers(dev: Column, k: Double): Column =
    ExpressionUtils.column(MadOutliersAgg(
      ExpressionUtils.expression(dev), k).toAggregateExpression())

  /** Order-preserving involution from doubleToLongBits keys to
    * signed-long-comparable longs: signed order of the image ==
    * `Double.compare` total order of the preimage (negatives keep the
    * sign bit and reverse magnitude; −0.0 maps to −1 just below +0.0
    * at 0; buffer keys are doubleToLongBits-CANONICAL, so the single
    * possible NaN key 0x7ff8… stays greatest among positives). */
  private[graftx] def sortableBits(b: Long): Long =
    if (b < 0L) b ^ 0x7fffffffffffffffL else b

  /** Values and counts of a bits-keyed counts map, sorted under total
    * double ordering (NaN greatest, -0.0 < 0.0) — the same expanded
    * multiset Spark's percentile walks — as two PRIMITIVE arrays: map
    * each key through [[sortableBits]], `Arrays.sort` the long[]
    * (dual-pivot, no comparator dispatch, no boxed tuples), then
    * rebuild values/counts in order via O(1) map lookups. Measured
    * 2.9× the former boxed-tuple comparator sort at the 2 M-distinct
    * budget ceiling (SCALE.md madsort15, round-14 ADVICE #2); order
    * equality with the boxed spelling is element-wise asserted in the
    * probe and bit-parity-pinned by ProfilingSketchSpec's NaN/−0.0
    * fixtures. */
  private[graftx] def sortedPairs(
      counts: OpenHashMap[Long, Long]): (Array[Double], Array[Long]) = {
    val keys = new Array[Long](counts.size)
    var i = 0
    counts.foreach { case (bits, _) => keys(i) = sortableBits(bits); i += 1 }
    java.util.Arrays.sort(keys)
    val vs = new Array[Double](keys.length)
    val cs = new Array[Long](keys.length)
    i = 0
    while (i < keys.length) {
      val bits = sortableBits(keys(i)) // involution: back to the key
      vs(i) = java.lang.Double.longBitsToDouble(bits)
      cs(i) = counts(bits)
      i += 1
    }
    (vs, cs)
  }

  /** Spark Percentile.getPercentile VERBATIM at p = 0.5 over sorted
    * pairs totalling `n`: higher == lower (or equal keys) -> the value
    * itself; else the TWO-PRODUCT interpolation
    * (higher − position)·lo + (position − lower)·hi — NOT
    * lo + (hi − lo)·frac, which differs in the last ulp for ~9% of
    * middle-value pairs and would break the bit-identical contract
    * with the percentile-based spelling and the oracle. The equal-keys
    * guard is primitive ==, NOT Double.compare: Spark sees
    * -0.0 == 0.0 as equal and returns lo rather than interpolating —
    * the bits matter under a differential gate (NaN middle keys
    * compare unequal either way and fall through to a NaN
    * interpolation on both sides).
    *
    * ONE documented bits-level caveat (round-16): when the median
    * rank(s) land where a -0.0 run meets a +0.0 run, Spark's own
    * percentile is not deterministic in the SIGN of the zero it
    * returns — its sort key is SQLOrderingUtil.compareDoubles, under
    * which -0.0 and +0.0 compare EQUAL, so the stable sortBy keeps
    * whatever order its OpenHashMap buffer iterates in (a function of
    * hash-table capacity, observed +0.0-first at small sizes). This
    * walk instead uses the strict bits total order (-0.0 < +0.0) and
    * deterministically returns the -0.0 side of the boundary. The
    * VALUE is identical (the zeros are SQL-equal, group-key
    * normalization erases the sign, and |±0.0 − v| devs agree
    * bit-for-bit), so every downstream quantity — MAD, fences, outlier
    * counts — is unaffected; only a doubleToLongBits inspection of the
    * median itself can see it. ProfilingSketchSpec's gz2 fixture pins
    * exactly this: med compared value-equal, MAD compared bits. */
  private[graftx] def interpolatedMedian(vs: Array[Double], cs: Array[Long],
                                         n: Long): Double = {
    val pos = 0.5 * (n - 1).toDouble
    val loRank = math.floor(pos).toLong
    val hiRank = math.ceil(pos).toLong
    var lo = 0.0; var hi = 0.0
    var cum = 0L; var i = 0; var foundLo = false; var foundHi = false
    while (i < vs.length && !foundHi) {
      cum += cs(i)
      if (!foundLo && cum > loRank) { lo = vs(i); foundLo = true }
      if (!foundHi && cum > hiRank) { hi = vs(i); foundHi = true }
      i += 1
    }
    if (hiRank == loRank || lo == hi) lo
    else (hiRank.toDouble - pos) * lo + (pos - loRank.toDouble) * hi
  }

  /** Count of deviations beyond the mad-fence, with Spark SQL's double
    * `>` (SQLOrderingUtil.compareDoubles): equal primitives are equal
    * (-0.0 == 0.0 → not greater), otherwise Double.compare's total
    * order — NaN GREATEST. A JVM-primitive `>` walk silently differs
    * on NaN devs (never outliers primitively; always outliers vs a
    * finite positive threshold under SQL), breaking bit-parity with
    * the above-budget SQL predicate for minority-NaN groups. The
    * predicate is the two-agg SQL spelling verbatim: mad > 0 &&
    * dev > mad·k || mad = 0 && dev > 0. NaN mad: SQL's mad > 0 HOLDS
    * (NaN greatest) but dev > NaN·k never does — 0 outliers, the same
    * net result either way. */
  private[graftx] def fenceTail(vs: Array[Double], cs: Array[Long],
                                mad: Double, k: Double): Long = {
    @inline def gtSql(a: Double, b: Double): Boolean =
      !(a == b) && java.lang.Double.compare(a, b) > 0
    val thr = mad * k
    var outliers = 0L
    var j = 0
    while (j < vs.length) {
      val value = vs(j)
      val isOut = (gtSql(mad, 0.0) && gtSql(value, thr)) ||
        (mad == 0.0 && gtSql(value, 0.0))
      if (isOut) outliers += cs(j)
      j += 1
    }
    outliers
  }
}

/** The ONE-PASS exact robust-outlier report: median, MAD and the
  * k·MAD tail count of a double column from a single value→count
  * buffer — the full fusion of `Profiling.robustOutliers`' below-
  * budget plan (which paid a separate counts-map `percentile` pass
  * for the median, then a [[MadOutliersAgg]] pass over the joined-in
  * deviations, purely because neither threshold is known until the
  * previous aggregate lands). The buffer IS the distribution, so eval
  * answers all three: the interpolated median
  * ([[MadOutliersAgg.interpolatedMedian]], Spark-percentile-verbatim),
  * then the deviation multiset DERIVED from the same pairs
  * (|v − med| per distinct value, re-collapsed by bits — exactly the
  * multiset Spark's percentile buffer would hold for the dev column:
  * boxed-equal NaNs merge, -0.0/0.0 stay distinct), its interpolated
  * median (the MAD), and the SQL-`>` fence walk
  * ([[MadOutliersAgg.fenceTail]]). Bit-identical to the two-aggregate
  * spelling by construction — every helper is shared verbatim — and
  * pinned by ProfilingSketchSpec's NaN-majority/minority and
  * degenerate fixtures. Null inputs count in n_rows, are invisible to
  * both medians, and are never outliers; an all-null group reports
  * null median and MAD. Same distinct-values budget contract as
  * [[MadOutliersAgg]] (Profiling.robustOutliers probes cardinality
  * before routing here).
  *
  * Returns struct(med, mad, n_outliers, n_rows). */
case class RobustOutliersAgg(child: Expression, k: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MadOutliersAgg.Buf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("med", DoubleType, nullable = true),
    StructField("mad", DoubleType, nullable = true),
    StructField("n_outliers", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MadOutliersAgg.Buf =
    new MadOutliersAgg.Buf(new OpenHashMap[Long, Long](), 0L)

  override def update(buf: MadOutliersAgg.Buf,
                      input: InternalRow): MadOutliersAgg.Buf = {
    val v = child.eval(input)
    if (v == null) buf.nulls += 1
    else buf.counts.changeValue(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L, _ + 1L)
    buf
  }

  override def merge(buf: MadOutliersAgg.Buf,
                     other: MadOutliersAgg.Buf): MadOutliersAgg.Buf = {
    other.counts.foreach { case (bits, cnt) =>
      buf.counts.changeValue(bits, cnt, _ + cnt)
    }
    buf.nulls += other.nulls
    buf
  }

  override def eval(buf: MadOutliersAgg.Buf): Any = {
    var n = 0L
    buf.counts.foreach { case (_, c) => n += c }
    if (n == 0L) return InternalRow(null, null, 0L, buf.nulls)
    val (vs, cs) = MadOutliersAgg.sortedPairs(buf.counts)
    val med = MadOutliersAgg.interpolatedMedian(vs, cs, n)
    if (java.lang.Double.isNaN(med)) {
      // a NaN median makes EVERY deviation |v − med| NaN: the dev
      // multiset is one NaN entry, whose interpolated median is NaN,
      // and the SQL fence (dev > NaN·k never holds; mad = 0 never
      // holds) counts zero outliers — returned directly instead of
      // materializing that degenerate dev table
      return InternalRow(med, Double.NaN, 0L, n + buf.nulls)
    }
    val fin = if (java.lang.Double.isNaN(vs(vs.length - 1))) vs.length - 1
              else vs.length
    if (!java.lang.Double.isFinite(med)) {
      // med = ±Inf (an infinite value at the median positions, or a
      // huge-magnitude interpolation overflowing): |v − med| is NaN
      // for v primitively EQUAL to med (Inf − Inf) and +Inf for every
      // other value, finite or opposite-infinity — the sorted dev
      // multiset is at most the two entries [+Inf, NaN], built
      // directly. The outward merge below assumes a FINITE center
      // (only then are its two runs monotone): fed med = +Inf it
      // emitted the equal-to-med NaN devs FIRST — an unsorted dev
      // array, and unmerged with the appended NaN-value entry —
      // breaking bit-parity with the two-aggregation SQL spelling
      // (pinned by ProfilingSketchSpec's Inf-median fixtures).
      var eq = 0L
      var other = 0L
      var i = 0
      while (i < fin) {
        if (vs(i) == med) eq += cs(i) else other += cs(i)
        i += 1
      }
      val nanC = eq + (if (fin < vs.length) cs(fin) else 0L)
      val sz = (if (other > 0L) 1 else 0) + (if (nanC > 0L) 1 else 0)
      val dvs = new Array[Double](sz)
      val dcs = new Array[Long](sz)
      var o = 0
      if (other > 0L) {
        dvs(o) = Double.PositiveInfinity; dcs(o) = other; o += 1
      }
      if (nanC > 0L) { dvs(o) = Double.NaN; dcs(o) = nanC }
      val mad = MadOutliersAgg.interpolatedMedian(dvs, dcs, n)
      val outliers = MadOutliersAgg.fenceTail(dvs, dcs, mad, k)
      return InternalRow(med, mad, outliers, n + buf.nulls)
    }
    // The dev multiset |v − med| in sorted order WITHOUT a second
    // hash-build + sort: around a finite median the deviations of the
    // sorted values are two sorted runs (left of the split descending
    // toward 0, right ascending), so one outward two-pointer merge
    // yields them in order — the MedianMadAgg integer spelling,
    // extended to doubles. Exactness vs the former bits-keyed rebuild:
    // abs(fl(med − v)) == fl(|v − med|) == abs(fl(v − med)) exactly
    // (IEEE negation is exact, rounding is sign-symmetric, and abs
    // never yields -0.0), equal devs across the two runs
    // are double-taken into one entry exactly as equal BITS merged
    // (finite abs results: primitive == iff bits ==), rounding-equal
    // adjacent devs WITHIN a run stay adjacent entries whose expanded
    // multiset — the thing the median walk and the fence sum consume —
    // is unchanged, and the (single, bits-canonical) NaN value entry
    // appends last with dev NaN, where the dev total order puts it.
    // first finite index strictly above the median: equal-to-med
    // values (incl. -0.0 vs 0.0, primitively equal) stay on the left
    // run, where the abs'd dev below is +0.0 exactly as the SQL abs
    var split = 0
    while (split < fin && !(vs(split) > med)) split += 1
    val devCap = fin + (if (fin < vs.length) 1 else 0)
    var dvs = new Array[Double](devCap)
    var dcs = new Array[Long](devCap)
    var l = split - 1
    var r = split
    var o = 0
    while (l >= 0 || r < fin) {
      // no sentinel values: a REAL ±Infinity input makes a legitimate
      // +Infinity deviation, which a sentinel would collide with
      val hasL = l >= 0
      val hasR = r < fin
      // the left-run dev is abs'd: bare med − v yields -0.0 for the
      // (med = -0.0, v = +0.0) pair, a bits-level MAD divergence from
      // the SQL spelling's abs(); abs is exact and never returns -0.0.
      // The right run needs no abs — vs(r) > med strictly, and the
      // difference of two unequal finite doubles never rounds to zero
      val devL = if (hasL) math.abs(med - vs(l)) else 0.0
      val devR = if (hasR) vs(r) - med else 0.0
      if (hasL && (!hasR || devL <= devR)) {
        dvs(o) = devL; dcs(o) = cs(l); l -= 1
        // equal devs across the two runs are ONE dev value — exactly
        // the entries the former bits-keyed rebuild merged
        if (hasR && devR <= devL) { dcs(o) += cs(r); r += 1 }
        o += 1
      } else {
        dvs(o) = devR; dcs(o) = cs(r); r += 1; o += 1
      }
    }
    if (fin < vs.length) { dvs(o) = Double.NaN; dcs(o) = cs(fin); o += 1 }
    if (o < devCap) {
      dvs = java.util.Arrays.copyOf(dvs, o)
      dcs = java.util.Arrays.copyOf(dcs, o)
    }
    val mad = MadOutliersAgg.interpolatedMedian(dvs, dcs, n)
    val outliers = MadOutliersAgg.fenceTail(dvs, dcs, mad, k)
    InternalRow(med, mad, outliers, n + buf.nulls)
  }

  override def serialize(buf: MadOutliersAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + buf.counts.size * 16)
    bb.putLong(buf.nulls)
    bb.putInt(buf.counts.size)
    buf.counts.foreach { case (bits, c) =>
      bb.putLong(bits); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): MadOutliersAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val nulls = bb.getLong
    val sz = bb.getInt
    val m = new OpenHashMap[Long, Long](math.max(sz, 1))
    var i = 0
    while (i < sz) { m.update(bb.getLong, bb.getLong); i += 1 }
    new MadOutliersAgg.Buf(m, nulls)
  }

  override def withNewMutableAggBufferOffset(o: Int): RobustOutliersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RobustOutliersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): RobustOutliersAgg =
    copy(child = c)
  override def prettyName: String = "robust_outliers"
}

object RobustOutliersAgg {
  /** struct(med, mad, n_outliers, n_rows) of a double column at fence
    * multiplier `k`, in ONE counts-map aggregation. */
  def robustOutliers(v: Column, k: Double): Column =
    ExpressionUtils.column(RobustOutliersAgg(
      ExpressionUtils.expression(v), k).toAggregateExpression())
}

/** EXACT fused integer lower-median + lower-MAD in ONE aggregation —
  * the counts-map fusion of `Profiling.medianAbsDeviation`'s two
  * distinct-value median passes (reference semantics: robust
  * center+scale profile over cent-quantized money, KBDatalakeApps'
  * median±MAD outlier gate). The per-group buffer is one value→count
  * map over the LONG cent values; `eval` answers BOTH medians from it:
  * the LOWER median of the values (integer half-total rule — the
  * smallest v with 2·cum ≥ n, DuckDB's `cum * 2 >= n → min(vc)`
  * spelling verbatim) and then the lower median of |v − med| by an
  * outward two-pointer merge over the SAME sorted array — deviations
  * of a sorted sequence around a fixed center are two sorted runs, so
  * no second map, no second pass, no re-sort. Every quantity is an
  * exact integer (absolute deviations of cents are cents); the only
  * IEEE ops are the callers' final /100 rescales — bit-identical to
  * the two-pass spelling AND the SQL oracle by construction.
  *
  * Null inputs are invisible (callers pre-filter; a defensive skip
  * keeps the buffer clean regardless); a group with zero non-null
  * values evals to (0, null, null). Buffer state is one 16-byte entry
  * per DISTINCT cent value — callers route here only under the same
  * distinct-values budget that gates [[MadOutliersAgg]]
  * (Profiling.medianAbsDeviation probes cardinality first and falls
  * back to the windowed distinct-value-table spelling above it).
  *
  * Returns struct(n, med_c, mad_c) — counts and cents, all LONG. */
case class MedianMadAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OpenHashMap[Long, Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("med_c", LongType, nullable = true),
    StructField("mad_c", LongType, nullable = true)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): OpenHashMap[Long, Long] =
    new OpenHashMap[Long, Long]()

  override def update(buf: OpenHashMap[Long, Long],
                      input: InternalRow): OpenHashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) buf.changeValue(v.asInstanceOf[Long], 1L, _ + 1L)
    buf
  }

  override def merge(buf: OpenHashMap[Long, Long],
                     other: OpenHashMap[Long, Long]): OpenHashMap[Long, Long] = {
    other.foreach { case (k, c) => buf.changeValue(k, c, _ + c) }
    buf
  }

  override def eval(buf: OpenHashMap[Long, Long]): Any = {
    if (buf.size == 0) return InternalRow(0L, null, null)
    // primitive key sort + O(1) map-lookup rebuild (keys are unique):
    // no boxed indices, no comparator dispatch — same spelling as
    // MadOutliersAgg.sortedPairs, minus the bits transform (cent longs
    // sort signed directly)
    val sk = new Array[Long](buf.size)
    var i = 0
    buf.foreach { case (k, _) => sk(i) = k; i += 1 }
    java.util.Arrays.sort(sk)
    val sc = new Array[Long](sk.length)
    i = 0
    while (i < sk.length) { sc(i) = buf(sk(i)); i += 1 }
    var n = 0L
    i = 0
    while (i < sc.length) { n += sc(i); i += 1 }
    // lower median of the values: first index where 2·cum ≥ n
    var cum = 0L; var iMed = 0
    while ({ cum += sc(iMed); cum * 2 < n }) iMed += 1
    val med = sk(iMed)
    // lower median of |v − med|: merge the two deviation runs (left of
    // med, descending index = ascending deviation; right of med
    // likewise) outward from the center. Equal deviations on both
    // sides are ONE deviation value — take both counts before the
    // half-total test, exactly as a grouped deviation table would.
    var dcum = sc(iMed) // deviation 0
    var mad = 0L
    if (dcum * 2 < n) {
      var l = iMed - 1
      var r = iMed + 1
      var found = false
      while (!found) {
        val devL = if (l >= 0) med - sk(l) else Long.MaxValue
        val devR = if (r < sk.length) sk(r) - med else Long.MaxValue
        if (devL <= devR) { dcum += sc(l); l -= 1 }
        if (devR <= devL) { dcum += sc(r); r += 1 }
        if (dcum * 2 >= n) { mad = math.min(devL, devR); found = true }
      }
    }
    InternalRow(n, med, mad)
  }

  override def serialize(buf: OpenHashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): OpenHashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val sz = bb.getInt
    val m = new OpenHashMap[Long, Long](math.max(sz, 1))
    var i = 0
    while (i < sz) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MedianMadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MedianMadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MedianMadAgg =
    copy(child = c)
  override def prettyName: String = "median_mad"
}

object MedianMadAgg {
  /** struct(n, med_c, mad_c) — integer lower median and lower MAD of a
    * LONG (cent-quantized) column in one counts-map aggregation. */
  def medianMad(vc: Column): Column =
    ExpressionUtils.column(MedianMadAgg(
      ExpressionUtils.expression(vc)).toAggregateExpression())
}
