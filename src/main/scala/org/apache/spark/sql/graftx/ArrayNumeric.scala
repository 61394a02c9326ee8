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

  /** Nearest-centroid id of `v` against a literal codebook (see
    * [[NearestCentroidId]]). `ids` must be ascending; `flat` is the
    * row-major `ids.length × dim` centroid matrix. */
  def nearestCentroid(v: Column, ids: Seq[Long], flat: Seq[Double],
                      dim: Int, l2: Boolean): Column =
    ExpressionUtils.column(NearestCentroidId(ExpressionUtils.expression(v),
      ids.toArray, flat.toArray, dim, l2))
}

/** Argmax cell assignment of a numeric array against a LITERAL centroid
  * codebook, as one compact two-level loop.
  *
  * Semantics are bit-identical to the unrolled expression it replaces
  * (`array_max` over per-centroid `struct(sim, -cell)` columns, sim =
  * `dot(v,c)/(|v|·|c|)` cosine or `dot(v,c) − |c|²/2` argmin-L2): the
  * dot accumulates left-to-right in double exactly like
  * [[NumericArrayDot]], centroid norms are folded the same way the
  * literal-expression norms were, comparison is `Double.compare` (the
  * engine's double ordering: NaN greatest), and sim ties keep the
  * LOWEST cell id (ids are required ascending; strictly-greater wins).
  *
  * Why not the unrolled form: with k centroids × dim terms it codegens
  * k inline dot loops per assignment — past ~32×8 the generated method
  * blows the JIT's 8 KB inline/compile budget ("too long to be JIT
  * compiled"), so it both compiles slowly at plan setup AND executes
  * interpreted. This loop is a few hundred bytes of bytecode regardless
  * of codebook size: JIT-hot, O(k·dim) per row, constant codegen cost.
  * One deviation: a null input yields null (nullIntolerant), where the
  * old struct-max folded all-null sims to the min cell — callers never
  * feed null vectors (embeddings are non-null by schema). */
case class NearestCentroidId(child: Expression, ids: Array[Long],
                             flat: Array[Double], dim: Int, l2: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(ids.nonEmpty && flat.length == ids.length * dim,
    s"codebook shape mismatch: ${ids.length} ids × $dim dims vs ${flat.length} values")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-centroid constant: sqrt-norm (cosine) or |c|²/2 (L2), folded
    * left-to-right like the literal expressions it replaces. */
  @transient private lazy val aux: Array[Double] = {
    val out = new Array[Double](ids.length)
    var c = 0
    while (c < ids.length) {
      var s = 0.0
      var i = 0
      while (i < dim) { val x = flat(c * dim + i); s += x * x; i += 1 }
      out(c) = if (l2) s / 2.0 else math.sqrt(s)
      c += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
    val n = x.numElements()
    var vn = 0.0
    if (!l2) {
      var i = 0
      while (i < n) { val xv = at(i); vn += xv * xv; i += 1 }
      vn = math.sqrt(vn)
    }
    val m = math.min(n, dim)
    var best = 0.0; var bestId = 0L; var first = true
    var c = 0
    while (c < ids.length) {
      var d = 0.0
      var i = 0
      while (i < m) { d += at(i) * flat(c * dim + i); i += 1 }
      val sim = if (l2) d - aux(c) else d / (vn * aux(c))
      if (first || java.lang.Double.compare(sim, best) > 0) {
        best = sim; bestId = ids(c); first = false
      }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    val auxRef = ctx.addReferenceObj("centAux", aux, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val vn = ctx.freshName("vn"); val xv = ctx.freshName("xv")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val first = ctx.freshName("first"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val off = ctx.freshName("off"); val sim = ctx.freshName("sim")
      val vnCode = if (l2) s"double $vn = 0.0;"
      else
        s"""
           |double $vn = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.$getter($i);
           |  $vn += $xv * $xv;
           |}
           |$vn = java.lang.Math.sqrt($vn);
         """.stripMargin
      val simCode = if (l2) s"$d - $auxRef[$c]" else s"$d / ($vn * $auxRef[$c])"
      s"""
         |int $n = $a.numElements();
         |$vnCode
         |int $m = java.lang.Math.min($n, $dim);
         |double $best = 0.0; long $bestId = 0L; boolean $first = true;
         |for (int $c = 0; $c < $idsRef.length; $c++) {
         |  double $d = 0.0; int $off = $c * $dim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $d += ((double) $a.$getter($i)) * $flatRef[$off + $i];
         |  }
         |  double $sim = $simCode;
         |  if ($first || java.lang.Double.compare($sim, $best) > 0) {
         |    $best = $sim; $bestId = $idsRef[$c]; $first = false;
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)
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
