package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / fuzzy record linkage: match dirty strings against
  * a clean reference WITHOUT an all-pairs comparison.
  *
  * Classic three-stage shape (Fellegi–Sunter style):
  *   1. BLOCK — candidate pairs come only from equi-joins on cheap
  *      derived keys (suffix, prefix+last-char, …). Multiple blocking
  *      passes are unioned then de-duplicated, so a corruption that
  *      breaks one key is caught by another.
  *   2. VERIFY — candidates are scored with Levenshtein edit distance,
  *      using Spark's thresholded variant (`levenshtein(l, r, k)`
  *      early-terminates the DP once the distance provably exceeds k —
  *      O(k·len) instead of O(len²) per pair).
  *   3. RESOLVE — best match per left record (min distance, stable
  *      tie-break) via one ranking window over the candidate set.
  *
  * Scale shape: every stage is an equi-shuffle on either the block key
  * or the left id — no cartesian anywhere (block-key joins bound the
  * candidate count by the block-size distribution; skewed blocks are the
  * caller's signal to add a more selective key). The windows run over
  * per-left-id candidate groups (a handful of rows each).
  */
object RecordLinkage {

  /** Candidate pairs from multi-pass blocking + edit-distance verify.
    * Output: all left columns, all right columns, `dist`.
    *
    * @param blockKeys one (leftKey, rightKey) derivation per blocking pass
    * @param maxDist   keep pairs with levenshtein ≤ maxDist
    */
  def candidates(left: DataFrame, right: DataFrame,
                 leftName: Column, rightName: Column,
                 blockKeys: Seq[(Column, Column)], maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    val passes = blockKeys.map { case (lk, rk) =>
      left.withColumn("__bk", lk).join(right.withColumn("__bk", rk), "__bk")
        .drop("__bk")
    }
    val unioned = passes.reduce(_ union _).dropDuplicates()
    unioned
      .withColumn("dist", levenshtein(leftName, rightName, maxDist))
      .filter(col("dist").between(0, maxDist))
  }

  /** Resolve to the single best match per left record: min distance,
    * then the given tie-break ordering; also reports how many verified
    * candidates the record had (the ambiguity signal a real pipeline
    * routes to review). */
  def bestMatch(cands: DataFrame, leftId: Column,
                tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(leftId)
    val ord = Window.partitionBy(leftId).orderBy(col("dist") +: tieBreak: _*)
    cands
      .withColumn("n_candidates", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
