package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size,
  * optionally overlapping character windows — the step that carves a
  * crawled corpus into model-context-sized training samples (and the
  * retrieval-chunking step of a RAG ingest pipeline).
  *
  * Scale shape: pure map-side — `sequence` builds the per-doc start
  * offsets inside the row (no join, no shuffle, no driver loop), the
  * generator explodes them, and `substring` slices each window from the
  * text the row already carries. Output partitioning inherits the scan;
  * a corpus of any size chunks in one embarrassingly parallel pass.
  * Overlap is `size - stride` characters (stride < size ⇒ sliding
  * windows; stride = size ⇒ disjoint blocks).
  */
object Chunking {

  /** One row per (doc, window): `chunk_idx` (0-based ordinal),
    * `chunk_start` (0-based char offset), `chunk_text`, `chunk_len`.
    * Final windows may be shorter than `size`; empty docs emit none.
    */
  def fixedWindows(df: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive")
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), length(col(textCol)) - 1, lit(stride))))
      .select(col(idCol),
        col("pos").cast("bigint").as("chunk_idx"),
        col("col").cast("bigint").as("chunk_start"),
        col(textCol).substr(col("col") + 1, lit(size)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("bigint"))
  }
}
