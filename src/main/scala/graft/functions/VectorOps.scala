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
