package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental table refresh (SURVEY §7.7): new genomes arrive as a
  * stream; only the clade partitions they touch are recomputed.
  *
  * `foreachBatch` + dynamic partition overwrite: each micro-batch
  * rewrites exactly the `partitionCol` values present in the batch and
  * leaves every other partition untouched — a trickle of updates never
  * rewrites the 100 TB table. This is the reference's work-skipping
  * memoization (pangenome.py:156-163: skip stage if output exists)
  * turned into a streaming-native contract.
  */
object IncrementalRefresh {

  def partitionedUpsert(updates: DataFrame, path: String,
                        partitionCol: String,
                        checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try batch.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      .start()
}
