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

  /** Per-file min/max/count skipping index over a parquet directory —
    * the payoff step of [[zorderBy]] (tight per-file boxes are only
    * useful if something consults them BEFORE the scan lists every
    * file). One distributed pass grouped on the hidden
    * `_metadata.file_path` column; no driver-side footer reads. The
    * result is one row per file — persist it next to the data and
    * rebuild on compaction, like a lakehouse table format's stats
    * (Delta/Iceberg manifests are public prior art; this is the
    * engine-local equivalent). */
  def fileStats(spark: org.apache.spark.sql.SparkSession, dir: String,
                cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose stats box intersects EVERY (column, lo, hi) range —
    * sound over-approximation: a qualifying row's file always survives
    * (min <= hi and max >= lo are implied), so a pruned read plus the
    * exact filter returns exactly the unpruned result. A file whose
    * stats are all-NULL for a column (no non-null values) cannot
    * satisfy a range predicate and is dropped. The collect is one row
    * per file — the same driver-resident scale as the scan planner's
    * own file listing. */
  def pruneFiles(stats: DataFrame, ranges: Seq[(String, Column, Column)]): Seq[String] = {
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    stats.filter(keep).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Incremental index maintenance: stats for files that have appeared
    * in `dir` since `oldStats` was built, unioned with the still-live
    * old rows. Only the NEW files are scanned (the ingest-time cost of
    * keeping the index fresh is proportional to the appended data, not
    * the table); rows for files deleted by compaction drop out via the
    * listing semi-filter. Listing is the same driver-side file
    * enumeration the scan planner itself performs. */
  def updateFileStats(spark: org.apache.spark.sql.SparkSession, dir: String,
                      oldStats: DataFrame, cols: Seq[String]): DataFrame = {
    val live = listParquetFiles(spark, dir)
    val known = oldStats.select(col("file"))
      .collect().map(_.getString(0)).toSet
    val fresh = (live -- known).toSeq.sorted
    val kept = oldStats.filter(col("file").isin(live.toSeq: _*))
    if (fresh.isEmpty) kept
    else {
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      // basePath keeps hive-partition columns derivable when the fresh
      // files sit under partition subdirectories
      val newStats = spark.read.option("basePath", dir).parquet(fresh: _*)
        .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
        .groupBy(col("file"))
        .agg(aggs.head, aggs.tail: _*)
      kept.unionByName(newStats)
    }
  }

  /** RECURSIVE parquet-file listing under `dir`, skipping hidden
    * (`_`/`.`-prefixed) entries the way Spark's own file index does. A
    * non-recursive `listStatus` silently returned an EMPTY live set on
    * hive-partitioned layouts (data lives in `k=v/` subdirectories),
    * which made [[updateFileStats]] drop every old row and discover
    * nothing. Driver-side, same scale as the scan planner's listing. */
  private def listParquetFiles(spark: org.apache.spark.sql.SparkSession,
                               dir: String): Set[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.Set.empty[String]
    // hidden check applies only to segments BELOW dir (the base itself
    // may legitimately live under a dotted/underscored parent)
    val qBase = fs.makeQualified(path).toUri.getPath.stripSuffix("/") + "/"
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = f.toUri.getPath.stripPrefix(qBase)
      val hidden = rel.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (f.getName.endsWith(".parquet") && !hidden) out += f.toUri.toString
    }
    out.toSet
  }

  /** Metadata-only count with a scan fallback only for boundary files:
    * a file whose whole [min,max] box lies INSIDE every range
    * contributes its `n_rows` straight from the index (zero I/O); only
    * files the range boxes cut through are actually read and filtered.
    * On a z-ordered table a narrow range turns almost every surviving
    * file into a fully-contained one, so the count is answered nearly
    * for free — the lakehouse metadata-query pattern. */
  def statsCount(spark: org.apache.spark.sql.SparkSession, dir: String,
                 stats: DataFrame,
                 ranges: Seq[(String, Column, Column)]): Long = {
    val intersects = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    val contained = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") >= lo && col(s"max_$c") <= hi
    }.reduce(_ && _)
    val rows = stats.filter(intersects)
      .select(col("file"), col("n_rows"), contained.as("full"))
      .collect()
    val fullCount = rows.filter(_.getBoolean(2)).map(_.getLong(1)).sum
    val partialFiles = rows.filterNot(_.getBoolean(2)).map(_.getString(0)).toSeq
    val exact = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val partialCount =
      if (partialFiles.isEmpty) 0L
      else spark.read.option("basePath", dir).parquet(partialFiles: _*)
        .filter(exact).count()
    fullCount + partialCount
  }

  /** Range-filtered read that consults the skipping index first: only
    * surviving files are listed/opened, then the exact predicate runs
    * over them (parquet row-group pruning still applies within each
    * file). Empty survivor set → empty frame with the right schema. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                 stats: DataFrame,
                 ranges: Seq[(String, Column, Column)]): DataFrame = {
    val files = pruneFiles(stats, ranges)
    val exact = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false))
    else
      // basePath keeps hive-partition columns in the per-file reads
      spark.read.option("basePath", dir).parquet(files: _*).filter(exact)
  }

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

  /** Bucketed (hash-clustered, optionally bucket-sorted) managed-table
    * write — the co-location strategy for RECURRING fact-to-fact
    * joins: two tables bucketed by the same key into the same bucket
    * count join with NO shuffle on either side (Spark's bucketing
    * metadata satisfies the join's distribution requirement), and
    * aggregations on the bucket key skip their exchange too. At
    * cluster scale this converts the nightly dominant shuffle into a
    * bucket-wise zip of pre-sorted files; the write pays that shuffle
    * ONCE instead of per consuming job. `sortBy` additionally makes
    * each bucket file sort-merge-ready, eliminating the join's sort.
    * LayoutSpec pins the exchange-free plan; probe bucket9 (SCALE.md)
    * measures the shuffle-byte collapse at 20M×20M. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }
}
