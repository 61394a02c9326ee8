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
      BloomScreen.bloomAggBuilder _))

  /** Register into an ALREADY-built session (e.g. one handed to a
    * library entry point after construction — too late for
    * `spark.sql.extensions`). Same builders as the extension path. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
