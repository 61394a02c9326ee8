package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the numeric-array hot paths.
  *
  * Lives under `org.apache.spark.sql` because the expression plumbing
  * it needs (`ExpressionUtils` Column bridge, `AbstractDataType` /
  * `TypeCollection` input-type specs) is `private[sql]`.
  *
  * These sit inside whole-stage codegen as tight primitive loops — no
  * per-element lambda dispatch, no hash-set allocation per row — which
  * matters because both are evaluated once per *candidate pair* in the
  * dedup/similarity joins (O(pairs · array_len) work). The higher-order
  * `aggregate`/`zip_with`/`array_intersect` formulations they replace
  * allocate per pair and dominated the sf0.1 bench.
  */
object ArrayNumeric {

  /** Dot product of two numeric arrays accumulated in double, exactly
    * like `aggregate(zip_with(a,b,(x,y)=>dbl(x)*dbl(y)),0.0,+)`: same
    * left-to-right order, same per-element double widening — so results
    * are bit-identical to the HOF formulation (and the SQL oracle). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(NumericArrayDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** |A ∩ B| for two ascending-sorted long arrays (merge scan). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Evaluate-once fence around an expensive expression: semantically
    * the identity, but it reports nondeterministic so the optimizer
    * neither substitutes it into join conditions when a downstream
    * filter references its alias (predicate pushdown through Project)
    * nor collapses the aliasing Project into consumers that reference
    * the alias several times. Used to pin O(array_len) per-pair scans
    * to exactly one evaluation per surviving row. */
  def evalOnce(c: Column): Column =
    ExpressionUtils.column(EvalOnceFence(ExpressionUtils.expression(c)))
}

/** Identity wrapper flagged nondeterministic purely as an optimizer
  * fence (see [[ArrayNumeric.evalOnce]]); evaluation and codegen
  * delegate to the child untouched. */
case class EvalOnceFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): EvalOnceFence =
    copy(child = newChild)
}

/** Σ a(i)·b(i) over float or double arrays, accumulating left-to-right
  * in double. Length = min(len(a), len(b)), matching `zip_with` on
  * equal-length inputs (embeddings are fixed-dim). */
case class NumericArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "numeric_array_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NumericArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two ascending-sorted `array<bigint>`
  * columns via a single merge scan: O(|A|+|B|), zero allocation.
  * Callers must pre-sort (`array_sort`) — done once per row, not per
  * pair, which is the whole point for pairwise similarity joins. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}
