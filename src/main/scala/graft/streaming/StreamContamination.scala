package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cleaning

/** Streaming contamination screen — the ingest-time face of
  * [[graft.operators.Cleaning.contamination]]: documents arriving on a
  * stream are screened against the (static, broadcast) eval-benchmark
  * gram set as they land, so a contaminated doc is flagged in the
  * micro-batch it arrives in, not at the next full-corpus sweep.
  *
  * Shape: documents are ATOMIC rows, so the gram explode and the
  * broadcast stream-static join are stateless; the only stateful op is
  * the per-doc hit count, whose group (one doc's grams) completes
  * within the doc's own micro-batch — emitted in Update mode, state is
  * one counter per FLAGGED doc (pair with a state TTL / event-time
  * watermark for eviction on an unbounded feed). The gram protocol
  * (tokenize, distinct word n-grams) is byte-identical to the batch
  * screen's, so the streamed verdicts equal the batch query's rows
  * (StreamingSpec pins the parity).
  */
object StreamContamination {

  def screen(docs: DataFrame, evalSet: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    val evalGrams = evalSet
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(explode_outer(Cleaning.wordGramsOf(col("__toks"), n)).as("gram"))
      .distinct()
    val exploded = docs
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), Cleaning.wordGramsOf(col("__toks"), n).as("grams"))
      .select(col(idCol), size(col("grams")).as("total"),
        explode_outer(col("grams")).as("gram"))
    exploded.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol), col("total"))
      .agg(count(lit(1)).as("hits"))
      .select(col(idCol), col("hits"),
        (floor(col("hits") / col("total") * 10000 + lit(0.5)) / 10000)
          .as("contamination"))
  }
}
