package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of
  * range-normalized key buckets so rows close in EVERY key dimension
  * land in the same output split. The payoff at 100 TB is file-skipping:
  * parquet min/max footers of a z-clustered table are tight boxes in all
  * key dimensions at once, so a scan filtered on ANY of the layout keys
  * prunes most files — a plain sort clusters only its leading column.
  *
  * Scale shape: bounds are a 1-row broadcast agg; the z-value itself is
  * pure integer bit arithmetic (codegen, no UDF); the write path is one
  * `repartitionByRange` on zval (range exchange with sampled bounds) +
  * in-partition sort — the same single shuffle a plain sorted write pays.
  */
object Layout {

  /** Range-normalized bucket of `c` into [0, 2^bits):
    * floor((v - lo) / (hi - lo + 1) * 2^bits). */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int): Column =
    floor((c - lo).cast("double") / (hi - lo + lit(1)).cast("double")
      * lit(1L << bits)).cast("long")

  /** Interleave the low `bits` bits of the bucket columns: column i
    * contributes its bit b at output position b * n + i. */
  def interleave(buckets: Seq[Column], bits: Int): Column =
    (for {
      b <- 0 until bits
      (c, ci) <- buckets.zipWithIndex
    } yield shiftright(c, b).bitwiseAND(lit(1L)) *
      lit(1L << (b * buckets.length + ci))).reduce(_ + _)

  /** Append `zval`: the Morton code of the range-normalized key
    * columns. Bounds come from one broadcast 1-row aggregate. */
  def zValue(df: DataFrame, keyCols: Seq[String], bits: Int): DataFrame = {
    val aggs = keyCols.flatMap(k =>
      Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val bucketCols = keyCols.map(k =>
      rangeBucket(col(k), col(s"__lo_$k"), col(s"__hi_$k"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("zval", interleave(bucketCols, bits))
      .drop(keyCols.flatMap(k => Seq(s"__lo_$k", s"__hi_$k")): _*)
  }

  /** Cluster rows into `nSplits` z-ordered splits (the layout a
    * `df.write` would then persist one file per split). */
  def zorderBy(df: DataFrame, keyCols: Seq[String], bits: Int,
               nSplits: Int): DataFrame =
    zValue(df, keyCols, bits)
      .repartitionByRange(nSplits, col("zval"))
      .sortWithinPartitions("zval")

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes` files. Streaming/incremental writers leave a long
    * tail of small files; at 100 TB that tail dominates scan planning
    * (driver-side listing, one task per file) and kills row-group
    * pruning. Split count comes from the ACTUAL on-disk bytes (Hadoop
    * listing), not a row-count guess, so the rewrite is one round-robin
    * shuffle to evenly sized files. Returns the split count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetBytes: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite-while-reading would corrupt or lose the input — and a
    // NESTED output is just as fatal (writing under the input rewrites
    // data the scan is still listing, and its stale bytes would count
    // into totalBytes on the next pass; an input nested under the
    // output gets clobbered by the overwrite). Compare with a
    // trailing separator so /data/x is not treated as an ancestor of
    // /data/xy.
    val qIn = fs.makeQualified(path).toString.stripSuffix("/") + "/"
    val qOut = fs.makeQualified(out).toString.stripSuffix("/") + "/"
    require(!qIn.startsWith(qOut) && !qOut.startsWith(qIn),
      s"compact input and output must be disjoint directories " +
        s"(got input=$inDir output=$outDir)")
    // recursive: a hive-partitioned input keeps its bytes in subdirs
    val totalBytes = fs.getContentSummary(path).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
