package org.apache.spark.sql.graftx

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketches (Apache
  * DataSketches frequencies, bundled with Spark) — the third leg of the
  * sketch cube family next to the HLL distinct cube and the KLL
  * quantile cube: [[FreqSketchAgg]] folds a string column into a
  * serialized Misra-Gries-style summary (map-side partial combine — the
  * shuffle carries fixed-size summaries, never token streams),
  * [[FreqUnionAgg]] merges stored summaries to any coarser grain, and
  * [[FreqHeavyHitters]] reads out the items whose frequency LOWER BOUND
  * clears a caller threshold under NO_FALSE_POSITIVES semantics.
  *
  * Why lower-bound + caller threshold instead of the sketch's own
  * maximum-error cut: purge history (and therefore the error term)
  * depends on merge order, which a distributed aggregation does not fix
  * — but every item whose true count clears the threshold by more than
  * the error bound (≈3.5·n/maxMapSize) is GUARANTEED in the output, and
  * every item below threshold−error is guaranteed out, so with
  * well-separated heavy hitters the output SET is deterministic and
  * differentially checkable against exact SQL even though the internal
  * estimates are not.
  *
  * At 100 TB: per-bucket vocabularies never shuffle — a fixed
  * `maxMapSize` summary per group travels instead, and the stored cube
  * rolls up to any coarser grain by union, no re-scan.
  */
object FreqSketch {

  /** Aggregate a string column into a serialized frequent-items sketch.
    * `maxMapSize` must be a power of two; error bound ≈ 3.5·n/maxMapSize. */
  def sketchAgg(value: Column, maxMapSize: Int): Column =
    ExpressionUtils.column(FreqSketchAgg(
      ExpressionUtils.expression(value), maxMapSize).toAggregateExpression())

  /** Merge serialized frequent-items sketches into one (rollup). */
  def unionAgg(sketch: Column, maxMapSize: Int): Column =
    ExpressionUtils.column(FreqUnionAgg(
      ExpressionUtils.expression(sketch), maxMapSize).toAggregateExpression())

  /** Items whose frequency lower bound ≥ `minLb`, sorted, no false
    * positives below the sketch's own error cut. */
  def heavyHitters(sketch: Column, minLb: Column): Column =
    ExpressionUtils.column(FreqHeavyHitters(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(minLb)))

  /** Total stream length folded into a sketch — lets a threshold be
    * expressed as a FRACTION of the (possibly rolled-up) stream without
    * a second scan. */
  def streamLength(sketch: Column): Column =
    ExpressionUtils.column(FreqStreamLength(ExpressionUtils.expression(sketch)))

  private[graftx] val serde = new ArrayOfStringsSerDe()
}

/** Shared buffer plumbing for the two frequent-items aggregates. */
trait FreqAggBase extends TypedImperativeAggregate[ItemsSketch[String]] {
  def maxMapSize: Int
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }
  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(FreqSketch.serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(FreqSketch.serde)
  override def deserialize(storage: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(storage), FreqSketch.serde)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `freq_sketch_agg(stringValue, maxMapSize)`: string column →
  * serialized frequent-items summary. String input declared so other
  * types arrive implicitly cast. */
case class FreqSketchAgg(child: Expression, maxMapSize: Int = 64,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends FreqAggBase with UnaryLike[Expression] with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
  override def prettyName: String = "freq_sketch_agg"
}

/** `freq_union_agg(sketchBinary, maxMapSize)`: merge stored summaries. */
case class FreqUnionAgg(child: Expression, maxMapSize: Int = 64,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends FreqAggBase with UnaryLike[Expression] with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqSketch.serde))
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
  override def prettyName: String = "freq_union_agg"
}

/** `freq_heavy_hitters(sketchBinary, minLb)`: sorted array of items
  * whose frequency lower bound ≥ minLb (NO_FALSE_POSITIVES). Runs over
  * group-count-sized frames, never the raw stream. */
/** `freq_stream_length(sketchBinary)`: the total item count the sketch
  * (including everything merged into it) has absorbed. */
case class FreqStreamLength(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), FreqSketch.serde)
      .getStreamLength
  override protected def withNewChildInternal(c: Expression): FreqStreamLength =
    copy(child = c)
  override def prettyName: String = "freq_stream_length"
}

case class FreqHeavyHitters(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression]
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, minLb: Any): Any = {
    val s = ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), FreqSketch.serde)
    val t = minLb.asInstanceOf[Long]
    val items = s.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .filter(_.getLowerBound >= t).map(_.getItem).sorted
    ArrayData.toArrayData(items.map(UTF8String.fromString))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqHeavyHitters = copy(left = l, right = r)
  override def prettyName: String = "freq_heavy_hitters"
}
