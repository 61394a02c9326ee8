package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * The dot product — the O(pairs · dim) inner loop of every similarity
  * operator — is a native codegen expression
  * ([[graft.expressions.NumericArrayDot]]): a tight primitive loop in
  * whole-stage codegen, bit-identical to the higher-order
  * `aggregate(zip_with(...))` formulation it replaced (same
  * left-to-right accumulation in double) but without per-element
  * lambda dispatch. Elements widen to double before accumulating: a
  * float fold loses ~3 decimal digits over 64 dims, and the
  * differential oracle computes in double.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.ArrayNumeric.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Normalize to unit length once up front: at scale, pre-normalizing
    * the corpus turns every cosine into a plain dot product, saving a
    * sqrt per comparison in the O(n·k) inner loop. */
  def unitNormalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Symmetric per-vector int8 quantization — the 4× (vs float32)
    * storage/IO cut a 100 TB embedding store takes before ANN serving:
    * scale = max|v|/127, code_i = floor(v_i/scale + 0.5) clamped to
    * [-127, 127] (the floor(+0.5) form is the engine-portable rounding
    * used across this repo's oracles; zero vectors quantize to zero
    * codes with scale 0). Returns struct(scale double, codes
    * array<int>). Dequantize = code_i · scale; the reconstruction
    * error per element is ≤ scale/2, so downstream cosine degrades by
    * O(1/254) per dim — SketchSpec-style bounds are pinned in
    * VectorQuantSpec. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = aggregate(v, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = maxAbs / 127.0d
    val codes = transform(v, x =>
      when(lit(true) && scale === 0.0d, lit(0))
        .otherwise(greatest(lit(-127),
          least(lit(127), floor(x.cast("double") / scale + 0.5d).cast("int")))))
    struct(scale.as("scale"), codes.as("codes"))
  }

  /** Dequantized vector from a [[quantizeInt8]] struct. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Sign-bit string of `v` against a fixed list of hyperplanes — the
    * random-hyperplane LSH bucket key (Charikar SimHash for cosine).
    * Hyperplanes are passed as literal arrays so the expression is
    * deterministic and reproducible in the SQL oracle. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
