package graft

import org.apache.spark.sql.functions._

/** The paged DSv2 source: parallel page partitions, deterministic
  * payloads, retry on injected transient failures, and the two
  * pushdowns (column prune, limit). */
class PagedSourceSpec extends SparkTestBase {

  private def paged(rows: Int, pageSize: Int, failEvery: Int = 0) =
    spark.read.format("graft.sources.PagedSource")
      .option("rows", rows).option("pageSize", pageSize)
      .option("failEvery", failEvery).load()

  test("reads all pages with deterministic payloads") {
    val df = paged(2500, 1000)
    assert(df.count() == 2500)
    val row = df.filter(col("id") === 1234).collect().head
    assert(row.getInt(row.fieldIndex("page")) == 1)
    assert(row.getString(row.fieldIndex("payload")) ==
      graft.sources.PagedBackend.md5Hex("1234"))
  }

  test("a non-default pageSize actually changes the page layout") {
    // regression: options used to be read case-sensitively with
    // lowercased keys, silently ignoring .option("pageSize", ...)
    val df = paged(2000, 500)
    assert(df.select(countDistinct(col("page"))).collect().head.getLong(0) == 4)
    val row = df.filter(col("id") === 1234).collect().head
    assert(row.getInt(row.fieldIndex("page")) == 2) // 1234 / 500
  }

  test("retries recover every failEvery-th page, and failures really fired") {
    val before = graft.sources.PagedBackend.failuresInjected.get()
    // pages 6 and 13 fail on first attempt; retry must make the read whole
    val df = paged(14000, 1000, failEvery = 7)
    assert(df.count() == 14000)
    assert(df.select(countDistinct(col("page"))).collect().head.getLong(0) == 14)
    // not vacuous: the injection path must have thrown at least twice
    assert(graft.sources.PagedBackend.failuresInjected.get() >= before + 2)
  }

  test("per-table page-size registry overrides the default") {
    // the named table takes its registry page size (100, the
    // reference's junction override), not the 1000 default
    val junction = spark.read.format("graft.sources.PagedSource")
      .option("rows", 1000).option("pageSize", 1000)
      .option("table", "junction")
      .option("pageSizes", "junction:100,genome_ani:1000").load()
    assert(junction.select(countDistinct(col("page")))
      .collect().head.getLong(0) == 10)
    // a table absent from the registry keeps the default
    val other = spark.read.format("graft.sources.PagedSource")
      .option("rows", 1000).option("pageSize", 1000)
      .option("table", "gtdb_species_clade")
      .option("pageSizes", "junction:100").load()
    assert(other.select(countDistinct(col("page")))
      .collect().head.getLong(0) == 1)
  }

  test("limit pushdown fetches only the needed pages") {
    val plan = paged(100000, 1000).limit(1500).queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan"))
    // pushed limit truncates the scan itself: rows=1500, two pages
    assert(plan.contains("rows=1500") || paged(100000, 1000).limit(1500).count() == 1500)
  }

  test("column pruning reaches the scan") {
    val df = paged(3000, 1000).select("id")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=id"))
    assert(df.agg(sum("id")).collect().head.getLong(0) == 2999L * 3000 / 2)
  }
}
