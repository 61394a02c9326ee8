package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram term frequencies of a text column as ONE
  * `map<string, bigint>` per row, built in a single pass over the
  * string — the shuffle-free spelling of
  * `explode(all n-gram substrings) → groupBy(doc, term).count()`.
  *
  * The explode+groupBy form materializes one row PER GRAM OCCURRENCE
  * (≈ text length) and exchanges that stream to aggregate it back to
  * ≈ distinct-grams-per-doc rows — at corpus scale, a full shuffle of
  * roughly the corpus's character volume whose only purpose is
  * within-row counting. Here the count happens in-row (no exchange,
  * no per-occurrence rows); callers `explode` the map to get the same
  * (doc, term, tf) stream at distinct-gram size.
  *
  * Exact contract (mirrors the gated oracle's
  * `generate_series(1, greatest(len − n + 1, 1)) → substring(i, n)`
  * and the former `sequence`/`substr` spelling): grams are codepoint
  * windows i = 1 … max(len − n + 1, 1) — so a shorter-than-n text
  * yields itself as its single gram, an empty text yields the empty
  * gram, and a NULL text yields a NULL map (callers use
  * `explode_outer`, keeping every document visible to doc counts). */
case class ShingleTf(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "shingle_tf"

  def tfMap(t: UTF8String): ArrayBasedMapData = {
    val len = t.numChars()
    val grams = math.max(len - n + 1, 1)
    // LinkedHashMap: deterministic (first-seen) key order, so plans
    // over the exploded stream are reproducible run to run
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 1
    while (i <= grams) {
      val g = t.substringSQL(i, n)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue.longValue()
      j += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def nullSafeEval(a: Any): Any = tfMap(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleTf", this, classOf[ShingleTf].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.tfMap($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleTf =
    copy(child = newChild)
}

object ShingleTf {
  /** map<gram, count> of the codepoint n-gram multiset of `text`. */
  def shingleTf(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleTf(ExpressionUtils.expression(text), n))
}
