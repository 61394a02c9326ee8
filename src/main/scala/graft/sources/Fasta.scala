package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA reader (reference: build_berdl_db.py:54-71 parses `>`-header
  * records into id→sequence maps; executor/task.py:64-79 counts them).
  *
  * Implemented with the text source's custom record delimiter: each
  * `>`-prefixed record becomes ONE row, so files split across
  * partitions without stateful cross-partition stitching — the property
  * that makes this scale to many-GB FASTA files. Header line is split
  * into id (first token) and description (rest); remaining lines concat
  * into the sequence.
  */
object Fasta {

  def read(spark: SparkSession, path: String): DataFrame = {
    val records = spark.read.option("lineSep", ">").text(path)
      .filter(length(trim(col("value"))) > 0)
    records
      .withColumn("header", substring_index(col("value"), "\n", 1))
      .withColumn("seq_lines", expr("substring(value, length(header) + 2)"))
      .select(
        substring_index(trim(col("header")), " ", 1).as("id"),
        // description: header minus the id token (empty if none)
        ltrim(expr("substring(trim(header), length(substring_index(trim(header), ' ', 1)) + 1)")).as("description"),
        upper(regexp_replace(col("seq_lines"), "[\\s\\r\\n]+", "")).as("seq"))
      .filter(length(col("id")) > 0)
  }

  /** Write a frame of (id, description, seq) as FASTA text (single
    * file per partition; `coalesce(1)` upstream for one file). A null
    * description writes as a bare header — concat would otherwise
    * null the whole record line and the text sink rejects null rows. */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat(lit(">"), col("id"), lit(" "),
      coalesce(col("description"), lit("")),
      lit("\n"), col("seq")).as("value"))
      .write.mode("overwrite").text(path)

  /** File-level audit count (reference: executor/task.py:64-79 counts
    * `>` lines of produced files): write `df` as FASTA (parallel, one
    * file per partition) and count headers back from the directory.
    * The write side effect is the point of the operator — it audits
    * the materialized artifact, not the in-memory frame. */
  def headerCount(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    write(df, path)
    spark.read.text(path)
      .filter(col("value").startsWith(">"))
      .agg(count(lit(1)).as("n_seqs"))
  }
}
