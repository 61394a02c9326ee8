package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column bridge to Catalyst's Bloom-filter pair
  * ([[BloomFilterAggregate]] / [[BloomFilterMightContain]] — the same
  * machinery Spark's runtime-filter join optimization injects), exposed
  * for the decontamination pre-screen in `graft.operators.Cleaning`.
  *
  * Both sides hash through [[XxHash64]] with the default seed so a
  * filter built by [[bloomAgg]] and probed by [[mightContain]] agree
  * bit-for-bit. The aggregate merges per-partition sketches (map-side
  * partial, one tiny final merge); the probe deserializes its literal
  * filter once per task and evaluates as a codegen'd bit test.
  */
object BloomScreen {

  /** Aggregate a string/binary/long column into a serialized Bloom
    * filter (BinaryType, one row). `numBits` bounds the sketch size
    * regardless of how badly `expectedItems` underestimates. */
  def bloomAgg(value: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(value))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `value` against a driver-collected serialized
    * Bloom filter. No false negatives; false-positive rate set by the
    * build-side sizing. `bytes` must come from [[bloomAgg]]. */
  def mightContain(bytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(value)))))

  /** `might_contain(filterBinary, xxhash64Value)` for the SQL surface —
    * mirrors the runtime-filter probe, which Spark keeps in its
    * INTERNAL registry (not resolvable from user SQL); registered by
    * [[GraftExtensions]]. */
  private[graftx] def mightContainBuilder(args: Seq[Expression]): Expression =
    BloomFilterMightContain(args(0), args(1))

  /** `bloom_filter_agg(xxhash64Value[, expectedItems[, numBits]])` for
    * the SQL surface — same internal-registry story as the probe. */
  private[graftx] def bloomAggBuilder(args: Seq[Expression]): Expression =
    (args match {
      case Seq(v)        => new BloomFilterAggregate(v)
      case Seq(v, n)     => new BloomFilterAggregate(v, n)
      case Seq(v, n, b)  => new BloomFilterAggregate(v, n, b)
      case _ => throw new IllegalArgumentException(
        s"bloom_filter_agg takes 1-3 arguments, got ${args.length}")
    }).toAggregateExpression()
}
