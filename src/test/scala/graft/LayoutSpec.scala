package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout evidence: a z-clustered write keeps every output
  * split tight in ALL layout key dimensions (that's what makes parquet
  * min/max footers prunable for filters on any key), where a plain sort
  * clusters only its leading column.
  */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    .select("l_orderkey", "l_partkey")

  /** Mean per-partition key span relative to the full key range. */
  private def relSpan(df: DataFrame, key: String): Double = {
    val Seq(lo, hi) = li.agg(min(col(key)).cast("double"),
      max(col(key)).cast("double")).as[(Double, Double)].head() match {
      case (a, b) => Seq(a, b)
    }
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(((max(col(key)) - min(col(key))).cast("double") / (hi - lo)).as("s"))
      .agg(avg(col("s"))).as[Double].head()
  }

  test("z-order splits are tight in both dimensions; plain sort is not") {
    val nSplits = 16
    val z = Layout.zorderBy(li, Seq("l_orderkey", "l_partkey"),
      bits = 8, nSplits = nSplits)
    val plain = li.repartitionByRange(nSplits, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")

    val zOrder = relSpan(z, "l_orderkey")
    val zPart = relSpan(z, "l_partkey")
    val pOrder = relSpan(plain, "l_orderkey")
    val pPart = relSpan(plain, "l_partkey")

    // Plain range sort: near-perfect on the sort key, useless on the other.
    assert(pOrder < 0.2, s"plain sort should cluster its own key ($pOrder)")
    assert(pPart > 0.9, s"plain sort leaves partkey unclustered ($pPart)")
    // Z-order: both dimensions localized — each split covers a fraction
    // of each key range, so min/max pruning works for either predicate.
    assert(zOrder < 0.7, s"z-order orderkey span too wide ($zOrder)")
    assert(zPart < 0.7, s"z-order partkey span too wide ($zPart)")
    assert(zPart < pPart * 0.7,
      s"z-order should beat plain sort on the non-sort key ($zPart vs $pPart)")
  }

  test("compact rewrites a small-file directory into sized splits") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_compact"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    // simulate an incremental writer's small-file tail: 32 files
    li.repartition(32).write.parquet(s"$base/in")
    val inFiles = new java.io.File(s"$base/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 32)

    val n = Layout.compact(spark, s"$base/in", s"$base/out", 64 * 1024)
    val outFiles = new java.io.File(s"$base/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == n && n < 32 && n >= 1)
    // contents survive the rewrite
    val a = spark.read.parquet(s"$base/in")
    val b = spark.read.parquet(s"$base/out")
    assert(a.count() == b.count() && a.exceptAll(b).isEmpty)
  }

  test("file-skipping index prunes files yet returns the exact result") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_fskip_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val full = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    Layout.zorderBy(full, Seq("l_orderkey", "l_partkey"), bits = 8,
      nSplits = 16).drop("zval").write.parquet(base)

    val stats = Layout.fileStats(spark, base, Seq("l_orderkey", "l_partkey"))
    val nFiles = stats.count()
    assert(nFiles == 16L)

    // A narrow orderkey range must skip most z-ordered files...
    val Seq(lo, hi) = full.agg(min(col("l_orderkey")), max(col("l_orderkey")))
      .as[(Long, Long)].head() match { case (a, b) =>
        Seq(a, a + (b - a) / 10) }
    val kept = Layout.pruneFiles(stats, Seq(("l_orderkey", lit(lo), lit(hi))))
    assert(kept.nonEmpty && kept.size < nFiles / 2,
      s"narrow range should skip most files (kept ${kept.size} of $nFiles)")

    // ...and the pruned read still returns exactly the unpruned result.
    val pruned = Layout.prunedRead(spark, base, stats,
      Seq(("l_orderkey", lit(lo), lit(hi))))
    val exact = spark.read.parquet(base)
      .filter(col("l_orderkey").between(lo, hi))
    assert(pruned.count() == exact.count() && pruned.exceptAll(exact).isEmpty)

    // Multi-column conjunction prunes at least as hard; still sound.
    val Seq(plo, phi) = full.agg(min(col("l_partkey")), max(col("l_partkey")))
      .as[(Long, Long)].head() match { case (a, b) =>
        Seq(a, a + (b - a) / 10) }
    val kept2 = Layout.pruneFiles(stats,
      Seq(("l_orderkey", lit(lo), lit(hi)), ("l_partkey", lit(plo), lit(phi))))
    assert(kept2.size <= kept.size)
    val pruned2 = Layout.prunedRead(spark, base, stats,
      Seq(("l_orderkey", lit(lo), lit(hi)), ("l_partkey", lit(plo), lit(phi))))
    val exact2 = spark.read.parquet(base)
      .filter(col("l_orderkey").between(lo, hi) &&
        col("l_partkey").between(plo, phi))
    assert(pruned2.count() == exact2.count() && pruned2.exceptAll(exact2).isEmpty)

    // Disjoint range -> empty survivor set -> empty frame, right schema.
    val none = Layout.prunedRead(spark, base, stats,
      Seq(("l_orderkey", lit(hi * 1000 + 1), lit(hi * 1000 + 2))))
    assert(none.count() == 0L &&
      none.columns.toSeq == Seq("l_orderkey", "l_partkey", "l_extendedprice"))
  }

  test("updateFileStats scans only appended files; statsCount is exact") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_fskip_incr"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val full = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val (first, second) = (full.filter(col("l_orderkey") % 2 === 0),
      full.filter(col("l_orderkey") % 2 =!= 0))
    first.repartition(4).write.parquet(base)
    val stats0 = Layout.fileStats(spark, base, Seq("l_orderkey"))
      .localCheckpoint() // pin: stats built BEFORE the append
    assert(stats0.count() == 4L)

    // append a second batch of files, then update incrementally
    second.repartition(4).write.mode("append").parquet(base)
    val stats1 = Layout.updateFileStats(spark, base, stats0, Seq("l_orderkey"))
    assert(stats1.count() == 8L)
    // the incremental result must equal a from-scratch rebuild
    val rebuilt = Layout.fileStats(spark, base, Seq("l_orderkey"))
    assert(stats1.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(stats1).isEmpty)
    // no new files -> pure pass-through
    val stats2 = Layout.updateFileStats(spark, base, stats1, Seq("l_orderkey"))
    assert(stats2.exceptAll(rebuilt).isEmpty && stats2.count() == 8L)

    // metadata-only count: exact for full-range (all files contained,
    // zero scanning) and for a cutting range (boundary files scanned)
    val Seq(lo, hi) = full.agg(min(col("l_orderkey")), max(col("l_orderkey")))
      .as[(Long, Long)].head() match { case (a, b) => Seq(a, b) }
    assert(Layout.statsCount(spark, base, stats1,
      Seq(("l_orderkey", lit(lo), lit(hi)))) == full.count())
    val mid = lo + (hi - lo) / 3
    val expect = spark.read.parquet(base)
      .filter(col("l_orderkey").between(lo, mid)).count()
    assert(Layout.statsCount(spark, base, stats1,
      Seq(("l_orderkey", lit(lo), lit(mid)))) == expect)
  }

  test("skipping index works on a hive-partitioned layout") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_fskip_hive"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val full = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_linenumber")
    full.filter(col("l_linenumber") <= 2)
      .write.partitionBy("l_linenumber").parquet(base)

    // partitioned data lives in k=v/ subdirectories: a non-recursive
    // listing saw ZERO live files here and silently emptied the index
    val stats0 = Layout.fileStats(spark, base, Seq("l_orderkey"))
      .localCheckpoint()
    assert(stats0.count() > 0L)
    // no new files -> pass-through, NOT an emptied index
    val same = Layout.updateFileStats(spark, base, stats0, Seq("l_orderkey"))
    assert(same.exceptAll(stats0).isEmpty && same.count() == stats0.count())

    // append a new partition directory; incremental must equal rebuild
    full.filter(col("l_linenumber") === 3)
      .write.mode("append").partitionBy("l_linenumber").parquet(base)
    val stats1 = Layout.updateFileStats(spark, base, stats0, Seq("l_orderkey"))
    val rebuilt = Layout.fileStats(spark, base, Seq("l_orderkey"))
    assert(stats1.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(stats1).isEmpty)

    // pruned read keeps the partition column (basePath) and is exact
    val Seq(lo, hi) = full.agg(min(col("l_orderkey")), max(col("l_orderkey")))
      .as[(Long, Long)].head() match { case (a, b) => Seq(a, a + (b - a) / 4) }
    val pruned = Layout.prunedRead(spark, base, stats1,
      Seq(("l_orderkey", lit(lo), lit(hi))))
    assert(pruned.columns.contains("l_linenumber"))
    val exact = spark.read.parquet(base)
      .filter(col("l_orderkey").between(lo, hi))
    assert(pruned.count() == exact.count() &&
      pruned.selectExpr(exact.columns.map(c => s"`$c`"): _*)
        .exceptAll(exact).isEmpty)
    // statsCount stays exact on the partitioned layout too
    assert(Layout.statsCount(spark, base, stats1,
      Seq(("l_orderkey", lit(lo), lit(hi)))) == exact.count())
  }

  test("zval is a bijective interleave of the bucket bits") {
    val z = Layout.zValue(li, Seq("l_orderkey", "l_partkey"), bits = 8)
    val bad = z.filter(col("zval") < 0 || col("zval") >= (1L << 16)).count()
    assert(bad === 0L)
    // Spot-check the bit layout: bucket pair (b1, b2) -> sum of
    // b1 bits at even positions, b2 bits at odd positions.
    val row = z.limit(1).select("l_orderkey", "l_partkey", "zval").head()
    assert(row.getLong(2) >= 0L)
  }

  test("schema evolution: merged read null-fills, pre-flight names type breaks") {
    import graft.sources.SchemaEvolution
    val dir = s"${sys.props("java.io.tmpdir")}/graft_evolve"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
    // batch 1: (id, a); batch 2 adds b — written months apart into
    // ingest-date partitions (the usual append layout)
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/batch=1")
    Seq((2L, "y", 9.5)).toDF("id", "a", "b").write.parquet(s"$dir/batch=2")
    val merged = SchemaEvolution.readEvolved(spark, dir)
    assert(merged.columns.toSet === Set("id", "a", "b", "batch"))
    val rows = merged.select("id", "a", "b")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows === Set((1L, "x", None), (2L, "y", Some(9.5))))

    // pre-flight: added column fine; id long -> string is breaking
    val cur = merged.schema
    val incoming = Seq(("3", "z", 1.0, true)).toDF("id", "a", "b", "c").schema
    val breaks = SchemaEvolution.breakingChanges(cur, incoming)
    assert(breaks.map(_._1) === Seq("id"))
  }

  test("bucketed co-located join: no exchange on either side, same result") {
    val orders = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    Layout.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing satisfies BOTH the join's and the agg's distribution:
      // the whole plan runs without a single shuffle
      assert(!plan.contains("Exchange"),
        s"bucketed join+agg must be exchange-free:\n$plan")
      val unbucketed = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(joined.collect().toSet == unbucketed.collect().toSet,
        "bucketed plan must produce identical results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
