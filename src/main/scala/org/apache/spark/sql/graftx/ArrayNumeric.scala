package org.apache.spark.sql.graftx

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
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

  /** Nearest-centroid id of `v` against a BROADCAST codebook (see
    * [[NearestCentroidId]]). The book ships once per executor via the
    * broadcast mechanism instead of riding in every task binary. */
  def nearestCentroid(v: Column, bc: Broadcast[CentroidBook], l2: Boolean): Column =
    ExpressionUtils.column(NearestCentroidId(ExpressionUtils.expression(v), bc, l2))

  /** Top-`nprobe` nearest cells of `v` by (cosine desc, id asc) as
    * `array<long>` (see [[NearestCellsTopN]]) — the multi-probe
    * assignment against a broadcast codebook. */
  def nearestCells(v: Column, bc: Broadcast[CentroidBook], nprobe: Int): Column =
    ExpressionUtils.column(NearestCellsTopN(ExpressionUtils.expression(v), bc, nprobe))

  /** Per-row `map<id, dot(v, centroid)>` lookup table against a
    * broadcast codebook (see [[CentroidDotMap]]) — the ADC query-side
    * table, built without inlining any centroid literal. */
  def centroidDotMap(v: Column, bc: Broadcast[CentroidBook]): Column =
    ExpressionUtils.column(CentroidDotMap(ExpressionUtils.expression(v), bc))

  /** The centroid vector for a cell-id column, from a broadcast
    * codebook (see [[CentroidVector]]); null for an unknown id. */
  def centroidVector(cell: Column, bc: Broadcast[CentroidBook]): Column =
    ExpressionUtils.column(CentroidVector(ExpressionUtils.expression(cell), bc))

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

/** A fitted centroid codebook in flat broadcast-friendly form: `ids`
  * strictly ascending, `flat` the row-major `ids.length × dim` matrix.
  *
  * Always create ONE broadcast per fitted book and share it across the
  * expressions of a plan: the alternative (r5) carried the arrays as
  * expression FIELDS, so every task binary of every stage re-shipped
  * O(k·dim) doubles — at a production-shaped quantizer (256–4096 cells
  * × 64 dims) that is 0.1–2 MiB per task binary ("Broadcasting large
  * task binary" warnings). A `Broadcast` handle serializes to a few
  * bytes; the matrix moves once per executor, torrent-style. */
case class CentroidBook(ids: Array[Long], flat: Array[Double], dim: Int) {
  require(ids.nonEmpty && flat.length == ids.length * dim,
    s"codebook shape mismatch: ${ids.length} ids × $dim dims vs ${flat.length} values")
  require(ids.indices.tail.forall(i => ids(i - 1) < ids(i)),
    "codebook ids must be strictly ascending")

  /** sqrt |c| per centroid, folded left-to-right (cosine denominator). */
  @transient lazy val auxCos: Array[Double] = aux(l2 = false)

  /** |c|²/2 per centroid (argmin-L2 as argmax dot − |c|²/2). */
  @transient lazy val auxL2: Array[Double] = aux(l2 = true)

  private def aux(l2: Boolean): Array[Double] = {
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
}

object CentroidBook {
  /** From the (id, vector) list every fit returns (ascending by id). */
  def apply(centroids: Seq[(Long, Seq[Double])]): CentroidBook =
    CentroidBook(centroids.map(_._1).toArray, centroids.flatMap(_._2).toArray,
      centroids.head._2.size)
}

/** Shared shape of the broadcast-codebook expressions: a numeric-array
  * child scored against `bc.value`. The codebook is resolved from the
  * broadcast ONCE per executor (transient lazy), and generated code
  * calls back into the JIT-hot scoring method — constant codegen size
  * regardless of codebook size (the unrolled per-centroid expression
  * form blew the JIT's 8 KB budget past ~32×8 and fell back to
  * interpreted bytecode). */
trait CentroidBookExpression extends UnaryExpression with ExpectsInputTypes {
  def bc: Broadcast[CentroidBook]

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullIntolerant: Boolean = true

  @transient protected lazy val book: CentroidBook = bc.value
  @transient protected lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected final def elemAt(x: ArrayData, i: Int): Double =
    if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)

  /** dot(x, centroid c) over min(len, dim), left-to-right in double —
    * bit-identical to [[NumericArrayDot]] against the centroid. */
  protected final def centDot(x: ArrayData, m: Int, c: Int): Double = {
    val flat = book.flat
    val off = c * book.dim
    var d = 0.0
    var i = 0
    while (i < m) { d += elemAt(x, i) * flat(off + i); i += 1 }
    d
  }

  /** sqrt Σx² over the whole array, like `sqrt(dot(v,v))`. */
  protected final def vecNorm(x: ArrayData): Double = {
    val n = x.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) { val xv = elemAt(x, i); vn += xv * xv; i += 1 }
    math.sqrt(vn)
  }
}

/** Argmax cell assignment of a numeric array against a BROADCAST
  * centroid codebook.
  *
  * Semantics are bit-identical to the literal-codebook form it
  * replaces (and to the unrolled `array_max` over per-centroid
  * `struct(sim, -cell)` columns before that): sim = `dot(v,c)/(|v|·|c|)`
  * cosine or `dot(v,c) − |c|²/2` argmin-L2, dots accumulate
  * left-to-right in double exactly like [[NumericArrayDot]], comparison
  * is `Double.compare` (the engine's double ordering: NaN greatest),
  * and sim ties keep the LOWEST cell id (ids ascending, strictly-greater
  * wins). The DuckDB oracle replays the same argmax as a row_number
  * over (cosine DESC, cell ASC).
  *
  * Scale: the codebook travels via broadcast (once per executor), not
  * in the task binary — see [[CentroidBook]]; generated code is a
  * constant-size call into [[assign]] regardless of k·dim.
  * One deviation inherited from r5: a null input yields null
  * (nullIntolerant) — callers never feed null vectors. */
case class NearestCentroidId(child: Expression, bc: Broadcast[CentroidBook],
                             l2: Boolean)
    extends CentroidBookExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val auxArr: Array[Double] =
    if (l2) book.auxL2 else book.auxCos

  def assign(x: ArrayData): Long = {
    val ids = book.ids
    val n = x.numElements()
    val vn = if (l2) 0.0 else vecNorm(x)
    val m = math.min(n, book.dim)
    var best = 0.0; var bestId = 0L; var first = true
    var c = 0
    while (c < ids.length) {
      val d = centDot(x, m, c)
      val sim = if (l2) d - auxArr(c) else d / (vn * auxArr(c))
      if (first || java.lang.Double.compare(sim, best) > 0) {
        best = sim; bestId = ids(c); first = false
      }
      c += 1
    }
    bestId
  }

  override def nullSafeEval(a: Any): Any = assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidId].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.assign($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)
}

/** Top-`nprobe` cells of a numeric array by (cosine desc, cell-id asc)
  * against a broadcast codebook, as `array<long>` — the multi-probe
  * variant of [[NearestCentroidId]]. Order matches the
  * `slice(sort_array(array(struct(sim, -cell)), desc), 1, nprobe)`
  * formulation it replaces exactly: Spark's double ordering is
  * `Double.compare` (NaN greatest, -0.0 < 0.0), equal sims break to the
  * lower cell id. O(k·(dim + nprobe)) per row via selection, no
  * allocation beyond the output. */
case class NearestCellsTopN(child: Expression, bc: Broadcast[CentroidBook],
                            nprobe: Int)
    extends CentroidBookExpression {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  def cells(x: ArrayData): ArrayData = {
    val ids = book.ids
    val k = ids.length
    val vn = vecNorm(x)
    val m = math.min(x.numElements(), book.dim)
    val aux = book.auxCos
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) { sims(c) = centDot(x, m, c) / (vn * aux(c)); c += 1 }
    val p = math.min(nprobe, k)
    val out = new Array[Long](p)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < p) {
      var bi = -1
      var j = 0
      while (j < k) {
        if (!taken(j) && (bi < 0 || {
          val cmp = java.lang.Double.compare(sims(j), sims(bi))
          cmp > 0 || (cmp == 0 && ids(j) < ids(bi))
        })) bi = j
        j += 1
      }
      taken(bi) = true
      out(s) = ids(bi)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = cells(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCellsTopN].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.cells($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsTopN =
    copy(child = newChild)
}

/** Per-row ADC lookup table `map<cell-id, dot(v, centroid)>` against a
  * broadcast codebook — what `map_from_arrays(array(lit ids...),
  * array(dot(v, lit centroid)...))` built with O(k·dim) inlined
  * literals. Values accumulate left-to-right in double over
  * min(len, dim), identical to [[NumericArrayDot]] per entry; map key
  * order is the ascending id order, so `element_at` lookups behave
  * identically to the literal form. */
case class CentroidDotMap(child: Expression, bc: Broadcast[CentroidBook])
    extends CentroidBookExpression {

  override def dataType: DataType =
    MapType(LongType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "centroid_dot_map"

  def table(x: ArrayData): MapData = {
    val ids = book.ids
    val m = math.min(x.numElements(), book.dim)
    val vals = new Array[Double](ids.length)
    var c = 0
    while (c < ids.length) { vals(c) = centDot(x, m, c); c += 1 }
    new ArrayBasedMapData(new GenericArrayData(ids), new GenericArrayData(vals))
  }

  override def nullSafeEval(a: Any): Any = table(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidDotMap", this,
      classOf[CentroidDotMap].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.table($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDotMap =
    copy(child = newChild)
}

/** Centroid vector (as `array<double>`) for a LONG cell-id column from
  * a broadcast codebook — replaces the O(k·dim)-literal
  * `when(cell === id, array(lits...))` chain. An id not in the book
  * yields null (the chain's `otherwise(null)`); callers only feed ids
  * the same book assigned, so null never occurs in practice. */
case class CentroidVector(child: Expression, bc: Broadcast[CentroidBook])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_vector"

  @transient private lazy val book: CentroidBook = bc.value

  def vec(id: Long): ArrayData = {
    val idx = java.util.Arrays.binarySearch(book.ids, id)
    if (idx < 0) null
    else new GenericArrayData(java.util.Arrays.copyOfRange(
      book.flat, idx * book.dim, (idx + 1) * book.dim))
  }

  override def nullSafeEval(a: Any): Any = vec(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidVector", this,
      classOf[CentroidVector].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = $ref.vec($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidVector =
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
