package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * 2016 — public prior art, including the word-frequency optimization).
  *
  * Scale shape: the corpus is touched ONCE to build the word-frequency
  * table (one partial-agg groupBy; the classic observation that pair
  * statistics only need distinct words weighted by frequency). Every
  * merge round then runs over that vocabulary-sized table: adjacent
  * pair counts are a small agg, the driver takes only the single argmax
  * row per round, and the merge applies map-side as a literal string
  * replace. `localCheckpoint` per round keeps the plan flat instead of
  * nesting one replace per learned merge.
  *
  * Symbol strings use a TERMINATOR (not separator) encoding —
  * `"ab" -> "a¶b¶"` — so replacing the pair `a¶b¶` with `ab¶` is
  * exactly BPE's leftmost non-overlapping merge (a shared-boundary
  * separator form would skip back-to-back occurrences), and the same
  * `replace` semantics exist in any engine, which is what makes the
  * learner differentially testable in SQL.
  */
object Bpe {

  /** Symbol terminator: must not occur in corpus tokens. */
  val Term = "¶"

  /** Word-frequency table with terminator-encoded symbol strings:
    * (word, freq, s) where s is the word split into single-character
    * symbols. One corpus pass; vocabulary-sized output. */
  def wordFreq(corpus: DataFrame, textCol: String): DataFrame =
    Dedup.spread(corpus)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s", regexp_replace(col("word"), "(.)", s"$$1$Term"))

  /** Adjacent symbol pairs of `s` weighted by `freq`, aggregated —
    * the per-round pair statistics. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(col("s"), Term) // trailing "" element after the last terminator
    vocab
      .select(col("freq"), syms.as("syms"))
      .filter(size(col("syms")) >= 3) // at least two real symbols
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i).as("lhs"),
          element_at(col("syms"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("weight"))
  }

  /** Learn up to `nMerges` merges; returns (rank, lhs, rhs, weight)
    * rows in learning order. Ties break on (lhs, rhs) ascending so the
    * result is deterministic across engines and partitionings. */
  def learnMerges(spark: SparkSession, corpus: DataFrame, textCol: String,
                  nMerges: Int): DataFrame = {
    var vocab = wordFreq(corpus, textCol).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("weight"), asc("lhs"), asc("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (lhs, rhs, w) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r + 1, lhs, rhs, w))
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s"$lhs$Term$rhs$Term"), lit(s"$lhs$rhs$Term")))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "lhs", "rhs", "weight")
  }

  /** Tokenize `textCol` with a learned merge list (driver-side, rank
    * order): whitespace words -> character symbols -> fold each merge
    * as a literal replace -> array of subword symbols per word. The
    * whole encode is a map-side projection. */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val word = explode(split(trim(col(textCol)), "\\s+")).as("word")
    val chars = regexp_replace(col("word"), "(.)", s"$$1$Term")
    val folded = merges.foldLeft(chars) { case (c, (lhs, rhs)) =>
      replace(c, lit(s"$lhs$Term$rhs$Term"), lit(s"$lhs$rhs$Term"))
    }
    df.select(col("*"), word)
      .filter(col("word") =!= "")
      .withColumn("symbols", slice(split(folded, Term), lit(1),
        size(split(folded, Term)) - 1))
  }
}
