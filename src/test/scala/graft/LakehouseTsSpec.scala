package graft

import graft.core.Lakehouse

/** Guards `Lakehouse.table("events")` against BOTH parquet timestamp
  * encodings the fixture generator has produced across rounds:
  * TIMESTAMP(NANOS) (read as nanos-as-Long) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
  * The committed fixtures under src/test/resources/events_ts hold the
  * same five logical rows — the nanos file with deliberate sub-micro
  * noise — so `ts_us` must come back bit-identical from either file
  * (nanos truncate to micros, matching DuckDB's reader).
  */
class LakehouseTsSpec extends SparkTestBase {
  private def resDir(sub: String): String =
    getClass.getResource(s"/events_ts/$sub").getPath

  test("events ts_us is identical across nanos and micros-NTZ parquet encodings") {
    val nanos  = Lakehouse.table(spark, resDir("nanos"), "events")
    val micros = Lakehouse.table(spark, resDir("micros_ntz"), "events")

    assert(nanos.schema("ts_us").dataType.typeName == "long")
    assert(micros.schema("ts_us").dataType.typeName == "long")
    assert(!nanos.columns.contains("ts") && !micros.columns.contains("ts"))

    val n = nanos.select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = micros.select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == m, s"nanos/micros ts_us mismatch: $n vs $m")
    // exact expected epoch-micros, pinned (generator: 1700000000000000 + id*1234567)
    (1 to 5).foreach { id =>
      assert(m(id.toLong) == 1700000000000000L + id * 1234567L)
    }
  }

  test("events ts_us on the live sf0.001 fixture analyzes and is epoch-micros scaled") {
    val df = Lakehouse.table(spark, sfSmoke, "events")
    val row = df.selectExpr("min(ts_us)", "max(ts_us)", "count(*)").collect()(0)
    assert(row.getLong(2) > 0)
    // sanity: epoch micros for any plausible fixture date (2000..2100)
    assert(row.getLong(0) > 946684800000000L && row.getLong(1) < 4102444800000000L)
  }
}
