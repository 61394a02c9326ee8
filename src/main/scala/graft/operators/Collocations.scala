package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: rank adjacent word pairs by pointwise mutual
  * information — PMI = ln(p(ab) / (p(a)·p(b))) — the classic
  * phrase-detection pass that decides which bigrams become single
  * tokens in a tokenizer vocabulary (and surfaces domain terms in a
  * corpus data card).
  *
  * Scale shape: the corpus is tokenized ONCE into per-doc arrays and
  * materialized (Catalyst does not CSE the scan across the
  * unigram/bigram branches — without the checkpoint the corpus would
  * tokenize twice); bigrams are built INSIDE the row by zipping the
  * array with its own tail (no window, no per-doc shuffle/sort), so
  * both count sides are plain partial-agg groupBys. The count frames
  * are vocabulary-sized; the final unigram joins run shuffle-side at
  * worst and the top-k is TakeOrdered (per-partition heaps), never a
  * global sort.
  */
object Collocations {

  /** Top-`k` bigrams by PMI among those seen at least `minCount`
    * times: (w1, w2, n_ab, pmi), PMI rounded to 4 places and ranked on
    * the rounded value (w1, w2 tie-break) so the order is deterministic
    * across engines.
    */
  def bigramPmi(df: DataFrame, textCol: String,
                minCount: Long, k: Int): DataFrame = {
    val toks = Dedup.spread(df)
      .select(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => t =!= "").as("toks"))
      .localCheckpoint()
    // The unigram count frame feeds THREE consumers (w1 join, w2 join,
    // corpus total) and Catalyst does not CSE across branches — without
    // this materialization the explode+count pass over the whole corpus
    // runs once per consumer. The frame itself is vocabulary-sized.
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      .localCheckpoint()
    val nTail = greatest(size(col("toks")) - 1, lit(0))
    val bi = toks.select(explode(zip_with(
        slice(col("toks"), lit(1), nTail),
        slice(col("toks"), lit(2), nTail),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .localCheckpoint() // feeds both the total and the scored join
    val totals = uni.agg(sum(col("n_w")).cast("double").as("n_uni"))
      .crossJoin(bi.agg(sum(col("n_ab")).cast("double").as("n_bi")))
    // Both join sides are vocabulary-sized (bigram vocab can be 100M+
    // at web scale) — hinted so the planner can't "helpfully" broadcast
    // either one.
    val scored = bi.filter(col("n_ab") >= minCount)
      .join(uni.withColumnRenamed("n_w", "n_w1").hint("shuffle_hash"),
        col("w1") === col("w"))
      .drop("w")
      .join(uni.withColumnRenamed("n_w", "n_w2").hint("shuffle_hash"),
        col("w2") === col("w"))
      .drop("w")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", graft.queries.round4(log(
        (col("n_ab").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bi") * col("n_w1").cast("double") * col("n_w2")))))
    scored.select(col("w1"), col("w2"), col("n_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
