package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft codegen
  * expressions as SQL functions, so `spark.sql` passthrough (the
  * reference's raw-SQL surface) can reach them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graftx.GraftExtensions")
  * }}}
  *
  * then `SELECT sorted_intersect_size(a, b)`, `SELECT numeric_array_dot(x, y)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "_FUNC_(a, b) - intersection cardinality of two ascending-sorted array<bigint> (merge scan)"),
      (args: Seq[Expression]) => SortedLongIntersectSize(args(0), args(1))),
    (FunctionIdentifier("numeric_array_dot"),
      info("numeric_array_dot",
        "_FUNC_(a, b) - dot product of two float/double arrays, accumulated in double"),
      (args: Seq[Expression]) => NumericArrayDot(args(0), args(1))),
    (FunctionIdentifier("might_contain"),
      info("might_contain",
        "_FUNC_(filter, xxhash64_value) - Bloom-filter membership probe; pairs with bloom_filter_agg"),
      BloomScreen.mightContainBuilder _),
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "_FUNC_(xxhash64_value[, expected_items[, num_bits]]) - aggregate values into a serialized Bloom filter"),
      BloomScreen.bloomAggBuilder _),
    (FunctionIdentifier("kll_sketch_agg"),
      info("kll_sketch_agg",
        "_FUNC_(value[, k]) - fold doubles into a serialized mergeable KLL quantile sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v)    => KllSketchAgg(v).toAggregateExpression()
        case Seq(v, k) => KllSketchAgg(v, intLit(k, "k")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("kll_sketch_agg(value[, k])")
      }),
    (FunctionIdentifier("kll_union_agg"),
      info("kll_union_agg",
        "_FUNC_(sketch[, k]) - merge serialized KLL sketches (rollup)"),
      (args: Seq[Expression]) => args match {
        case Seq(v)    => KllUnionAgg(v).toAggregateExpression()
        case Seq(v, k) => KllUnionAgg(v, intLit(k, "k")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("kll_union_agg(sketch[, k])")
      }),
    (FunctionIdentifier("kll_quantile"),
      info("kll_quantile",
        "_FUNC_(sketch, p) - read the p-quantile (0..1) out of a serialized KLL sketch"),
      (args: Seq[Expression]) => KllQuantile(args(0), args(1))),
    (FunctionIdentifier("kll_rank"),
      info("kll_rank",
        "_FUNC_(sketch, x) - normalized rank (CDF) of x in a serialized KLL sketch"),
      (args: Seq[Expression]) => KllRank(args(0), args(1))),
    (FunctionIdentifier("kll_absdev_stats"),
      info("kll_absdev_stats",
        "_FUNC_(sketch, med, k) - struct(mad, n_outliers, n_rows) of |value-med| from a KLL sketch"),
      (args: Seq[Expression]) => KllAbsDevStats(args(0), args(1), args(2))),
    (FunctionIdentifier("freq_sketch_agg"),
      info("freq_sketch_agg",
        "_FUNC_(value[, maxMapSize]) - fold strings into a serialized mergeable frequent-items sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v)    => FreqSketchAgg(v).toAggregateExpression()
        case Seq(v, m) => FreqSketchAgg(v, intLit(m, "maxMapSize")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("freq_sketch_agg(value[, maxMapSize])")
      }),
    (FunctionIdentifier("freq_union_agg"),
      info("freq_union_agg",
        "_FUNC_(sketch[, maxMapSize]) - merge serialized frequent-items sketches (rollup)"),
      (args: Seq[Expression]) => args match {
        case Seq(v)    => FreqUnionAgg(v).toAggregateExpression()
        case Seq(v, m) => FreqUnionAgg(v, intLit(m, "maxMapSize")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("freq_union_agg(sketch[, maxMapSize])")
      }),
    (FunctionIdentifier("freq_heavy_hitters"),
      info("freq_heavy_hitters",
        "_FUNC_(sketch, min_lb) - sorted items whose frequency lower bound >= min_lb (no false positives)"),
      (args: Seq[Expression]) => FreqHeavyHitters(args(0), args(1))),
    (FunctionIdentifier("freq_stream_length"),
      info("freq_stream_length",
        "_FUNC_(sketch) - total item count folded into a frequent-items sketch"),
      (args: Seq[Expression]) => FreqStreamLength(args(0))))

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Register into an ALREADY-built session (e.g. one handed to a
    * library entry point after construction — too late for
    * `spark.sql.extensions`). Same builders as the extension path. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
