package org.apache.spark.sql.graftx

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType, StructField, StructType}

/** Mergeable quantile sketches (Apache DataSketches KLL, bundled with
  * Spark) — the percentile counterpart of the `hll_*` distinct family,
  * which Spark does not expose as SQL functions: `percentile_approx`
  * cannot persist or re-merge its intermediate state, so a lakehouse
  * can't keep a percentile CUBE. These aggregates can: [[KllSketchAgg]]
  * folds a double column into a serialized sketch (map-side partial
  * combine — the shuffle carries sketches, never raw values),
  * [[KllUnionAgg]] merges stored sketches to any coarser grain, and
  * [[KllQuantile]] reads a quantile out. Rank error ≈ 1.65%·(200/k)^0.9
  * at 99% confidence; sketch size grows ~O(k·log n).
  */
object KllSketch {

  /** Aggregate a double column into a serialized KLL sketch. */
  def sketchAgg(value: Column, k: Int): Column =
    ExpressionUtils.column(KllSketchAgg(
      ExpressionUtils.expression(value), k).toAggregateExpression())

  /** Merge serialized KLL sketches into one (rollup). */
  def unionAgg(sketch: Column, k: Int): Column =
    ExpressionUtils.column(KllUnionAgg(
      ExpressionUtils.expression(sketch), k).toAggregateExpression())

  /** Extract the `p`-quantile (0..1, inclusive criteria) of a
    * serialized sketch; null for an empty sketch. */
  def quantile(sketch: Column, p: Column): Column =
    ExpressionUtils.column(KllQuantile(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(p)))

  /** Normalized rank (CDF read) of `x` in a serialized sketch. */
  def rank(sketch: Column, x: Column): Column =
    ExpressionUtils.column(KllRank(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(x)))

  /** struct(mad, n_outliers, n_rows) of |value − med| computed from the
    * sketch's retained items — see [[KllAbsDevStats]]. */
  def absDevStats(sketch: Column, med: Column, k: Column): Column =
    ExpressionUtils.column(KllAbsDevStats(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(med),
      ExpressionUtils.expression(k)))
}

/** Shared KLL buffer plumbing for the two aggregates. */
trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(storage: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(storage))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `kll_sketch_agg(doubleValue, k)`: double column → serialized sketch.
  * Declares DoubleType input so int/float/decimal columns arrive
  * implicitly cast (without this, analysis passed any type and update
  * threw ClassCastException at execution). */
case class KllSketchAgg(child: Expression, k: Int = 200,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_union_agg(sketchBinary, k)`: merge stored sketches (rollup).
  * Binary input only — anything else is an analysis error, not a
  * runtime ClassCastException. */
case class KllUnionAgg(child: Expression, k: Int = 200,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
  override def prettyName: String = "kll_union_agg"
}

/** `kll_quantile(sketchBinary, p)`: read one quantile out of a stored
  * sketch. Interpreted eval only — quantile extraction runs over
  * bucket-count-sized frames, never the raw fact table. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression]
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, p: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
  override def prettyName: String = "kll_quantile"
}

/** `kll_rank(sketchBinary, x)`: the normalized rank (CDF value) of `x`
  * — the fraction of folded values ≤ x (inclusive criteria). The read
  * side of rank/quantile duality; with it a stored percentile cube
  * answers "what fraction of documents are shorter than L" without any
  * rescan. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression]
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, x: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getRank(x.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRank = copy(left = l, right = r)
  override def prettyName: String = "kll_rank"
}

/** `kll_absdev_stats(sketchBinary, med, k)` →
  * `struct(mad double, n_outliers bigint, n_rows bigint)`.
  *
  * Everything the robust (median/MAD) outlier report needs beyond the
  * median itself, answered from the SAME value sketch — so the whole
  * report is ONE scan of the data: the weighted median of |q − med|
  * over the sketch's retained items approximates the true MAD (each
  * retained item carries its merge weight), and `n_outliers` estimates
  * `#{x : |x − med| > k·mad}` by summing retained-item weights (the
  * mad = 0 degenerate group counts any deviation, mirroring the exact
  * path). Interpreted eval only — runs over group-count-sized frames,
  * never the fact table. */
case class KllAbsDevStats(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback with TernaryLike[Expression]
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("mad", DoubleType, nullable = false),
    StructField("n_outliers", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, med: Any, k: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) return null
    val m = med.asInstanceOf[Double]
    val kk = k.asInstanceOf[Double]
    // (|q − med|, weight) over retained items, sorted by deviation
    val it = s.getSortedView.iterator()
    val devs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    while (it.next()) devs += ((math.abs(it.getQuantile - m), it.getWeight))
    val sorted = devs.sortBy(_._1)
    val n = s.getN
    // weighted median: smallest deviation with cumulative weight ≥ n/2
    var cum = 0L
    var mad = 0.0
    val half = (n + 1) / 2
    val iter = sorted.iterator
    while (cum < half && iter.hasNext) {
      val (d, w) = iter.next(); cum += w; mad = d
    }
    val cut = if (mad > 0) kk * mad else 0.0
    var nOut = 0L
    sorted.foreach { case (d, w) => if (d > cut) nOut += w }
    InternalRow(mad, nOut, n)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): KllAbsDevStats =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "kll_absdev_stats"
}
