package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  /** Distinct winnowing fingerprints of a text column, ascending (see
    * [[WinnowFingerprints]]). */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(text), k, w))

  /** `c`, verbatim, behind a non-foldable fence (see [[OpaqueLiteral]]).
    * For the deliberate single-partition window key: `partitionBy(lit(0))`
    * loses its spec to `EliminateWindowPartitions` (and `hash(col)*0`
    * to zero-product simplification), after which the physical window
    * warns "No Partition Defined" and, worse, any future rule could
    * treat the spec as absent. An opaque constant is evaluated per row
    * (trivially) but never recognized as constant. */
  def opaque(c: Column): Column =
    ExpressionUtils.column(OpaqueLiteral(ExpressionUtils.expression(c)))
}

/** Identity wrapper that hides its child's foldability from the
  * optimizer: deterministic (legal in window/partition specs, unlike a
  * nondeterministic fence) yet never constant-folded or eliminated.
  * Codegen passes the child's code through unchanged. */
case class OpaqueLiteral(child: Expression) extends UnaryExpression {
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaqueLiteral =
    copy(child = newChild)
}

/** Winnowing (MOSS) fingerprints of a document in ONE pass over the
  * row: Karp-Rabin-hash every `k`-codepoint window of the text, keep
  * the minimum hash of each run of `w` consecutive window hashes,
  * return the distinct selected hashes ascending as `array<long>`.
  *
  * This subsumes what used to be a 4-operator subplan — position
  * `sequence`+`explode` (O(len) rows per doc), per-position
  * `md5(substr)`, a per-doc sort-window for the sliding min (a full
  * corpus SHUFFLE keyed by doc id), and a `distinct` — with a single
  * shuffle-free projection: winnowing is a purely document-local
  * computation, so at corpus scale the only cost left is the O(len)
  * rolling-hash scan itself, map-side on top of the file scan.
  *
  * The window hash packs two independent 31-bit polynomial hashes
  * (bases 31 and 131, both mod the prime 2³¹−1, over Unicode code
  * points, windows past the text end zero-padded) into one positive
  * long `h1·2³¹ + h2` — chosen over a single 64-bit hash because the
  * DuckDB oracle must reproduce it exactly in BIGINT-safe arithmetic
  * (`list_sum` of `codepoint × B^j mod M` terms stays < 2⁴³; a 64-bit
  * modulus would overflow DuckDB's BIGINT mid-sum). ~62 bits keeps
  * corpus-scale collision pairs negligible (birthday bound: ~10⁻⁵
  * expected spurious pairs per 10⁹ distinct windows).
  *
  * Selection rule (exactly the window-frame form it replaces): with
  * `n1 = max(len−k+1, 1)` window positions, positions `1..max(n1−w+1,
  * 1)` each contribute `min(hash over the next w windows, clamped to
  * n1)`. Two docs sharing any substring of ≥ k+w−1 codepoints share a
  * fingerprint (the winnowing guarantee, hash-function-independent).
  * A null text yields null. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  import WinnowFingerprints.{B1, B2, M}

  // B^(k-1) mod M, the rolling-subtract coefficients
  @transient private lazy val bk1: Long = WinnowFingerprints.modPow(B1, k - 1)
  @transient private lazy val bk2: Long = WinnowFingerprints.modPow(B2, k - 1)

  /** The whole algorithm, called once per row from both eval and the
    * generated code (the deque/sort logic is too branchy to gain from
    * inline codegen; one monomorphic call into a JIT-hot method keeps
    * the enclosing stage in whole-stage codegen without boxing). */
  def winnow(s: UTF8String): ArrayData = {
    val str = s.toString
    // code points, zero-padded so every window position has k codes
    val n = str.codePointCount(0, str.length)
    val n1 = math.max(n - (k - 1), 1)
    val cp = new Array[Int](n1 + k - 1)
    var ci = 0
    var si = 0
    while (si < str.length) {
      val c = str.codePointAt(si)
      cp(ci) = c; ci += 1
      si += Character.charCount(c)
    }
    // rolling double hash of every k-window
    val hs = new Array[Long](n1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) { h1 = (h1 * B1 + cp(i)) % M; h2 = (h2 * B2 + cp(i)) % M; i += 1 }
    var pos = 0
    while (pos < n1) {
      hs(pos) = h1 * 2147483648L + h2
      if (pos + 1 < n1) {
        val t1 = (h1 - cp(pos) * bk1 % M + M) % M
        h1 = (t1 * B1 + cp(pos + k)) % M
        val t2 = (h2 - cp(pos) * bk2 % M + M) % M
        h2 = (t2 * B2 + cp(pos + k)) % M
      }
      pos += 1
    }
    // sliding min over w consecutive windows (monotone deque)
    val p = math.max(n1 - (w - 1), 1)
    val out = new Array[Long](p)
    val dq = new Array[Int](n1)
    var head = 0; var tail = 0 // dq[head until tail], hs increasing
    var r = 0
    var sel = 0
    while (sel < p) {
      val end = math.min(sel + w - 1, n1 - 1)
      while (r <= end) {
        while (tail > head && hs(dq(tail - 1)) >= hs(r)) tail -= 1
        dq(tail) = r; tail += 1
        r += 1
      }
      while (dq(head) < sel) head += 1
      out(sel) = hs(dq(head))
      sel += 1
    }
    // distinct ascending
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < p) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  override def nullSafeEval(a: Any): Any = winnow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.winnow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Prime modulus 2³¹−1 and the two polynomial bases. Fixed protocol
    * constants — the DuckDB oracle SQL hard-codes the matching power
    * tables, so these must never change without changing both. */
  val M: Long = 2147483647L
  val B1: Long = 31L
  val B2: Long = 131L

  def modPow(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * b % M; i += 1 }
    r
  }
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
