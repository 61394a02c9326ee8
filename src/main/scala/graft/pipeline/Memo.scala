package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Work-skipping stage memoization — the reference reruns a pipeline
  * and skips every stage whose output file already exists
  * (berdl/berdl/pangenome/pangenome.py:156-163,
  * prep_genome_set.py:56-80). Same contract here, lakehouse-shaped:
  * a stage's identity is its output path; a COMMITTED dataset at that
  * path (parquet `_SUCCESS` marker) means the stage is done and its
  * builder never runs.
  *
  * Downstream always consumes the materialized artifact (not the
  * in-memory plan), so a resumed run and a fresh run read identical
  * bytes — and a 100 TB backfill that died at stage 4 restarts at
  * stage 4, not stage 1. A directory WITHOUT the marker is a torn
  * write: the stage reruns and overwrites it.
  */
object Memo {

  /** True iff `path` holds a committed parquet dataset. */
  def isDone(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  /** Run `build` and write its result to `path` ONLY when `path` has
    * no committed output yet; either way return a reader over the
    * materialized parquet. `build` is by-name — a skipped stage never
    * constructs its plan, so skipping is free even when building the
    * plan itself is expensive (e.g. it collects pivot values). */
  def runIfAbsent(spark: SparkSession, path: String)
                 (build: => DataFrame): DataFrame = {
    if (!isDone(spark, path))
      build.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
