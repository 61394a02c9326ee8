package graft.queries

import org.apache.spark.sql.functions._

/** Scans, projections, filters (SURVEY §2.1 S1/S4, §2.2 P1-P3/F1-F8).
  *
  * Every query is a declarative plan: the filter and the projection reach
  * the parquet scan (PushedFilters / ReadSchema in `.explain`), so at
  * 100 TB only the referenced columns and matching row groups are read.
  */
object CoreQueries {

  val queries: Map[String, QueryFn] = Map(
    // S1/S4: lazy parquet scan with filter+projection pushdown
    // (reference: query_pangenome_local.py:17-29).
    "s1_scan_project" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // P1: projection with rename (reference: datalake_table.py:121-137).
    "p1_select_alias" -> ((s, d) => {
      tbl(s, d, "nation").select(
        col("n_nationkey").as("id"),
        col("n_name").as("name"),
        col("n_regionkey").as("region_id"))
    }),

    // P2: conditional column (reference: datalake_table.py:128-129).
    "p2_conditional" -> ((s, d) => {
      tbl(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, lit("debt")).otherwise(lit("credit")).as("standing"))
    }),

    // P3: cast (reference: pangenome.py:193-196).
    "p3_cast" -> ((s, d) => {
      tbl(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("bigint").as("qty_int"))
    }),

    // F1: equality filter (reference: query_pangenome_local.py:28-29).
    "f1_eq_filter" -> ((s, d) => {
      tbl(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"))
    }),

    // F2: IN-set filter (reference: datalake_table.py:121).
    "f2_in_filter" -> ((s, d) => {
      tbl(s, d, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"))
    }),

    // F3: disjunctive equality (reference: query_pangenome_local.py:52-56).
    "f3_disjunctive" -> ((s, d) => {
      tbl(s, d, "events")
        .filter(col("event_type") === "error" || col("value") > 480.0)
        .select(col("event_id"), col("event_type"))
    }),

    // F4: LIKE pattern (reference: query_pangenome_berdl.py:73-90).
    "f4_like" -> ((s, d) => {
      tbl(s, d, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_name"))
    }),

    // F5/F6: inequality + null-handling via nullif/coalesce
    // (reference: build_berdl_db.py:695, 85-97).
    "f5_ne_null" -> ((s, d) => {
      tbl(s, d, "orders").select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status"))
    }),

    // F7: conjunctive boolean mask (reference: ontology_enrichment_local.py:127-132).
    "f7_conjunction" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_quantity") >= 10 && col("l_quantity") <= 20 &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // F8: prefix dispatch (reference: ontology_enrichment_local.py:321-327).
    "f8_prefix_dispatch" -> ((s, d) => {
      tbl(s, d, "part").select(
        col("p_partkey"),
        when(col("p_type").startsWith("ECO"), lit("economy"))
          .when(col("p_type").startsWith("SMALL"), lit("small"))
          .otherwise(lit("other")).as("bucket"))
    }),

    // F9: filename/suffix predicates — inputs chosen by path suffix,
    // the partition-pruning analogue (reference: datalake_table.py:
    // 202-205 `endswith('.faa')` file selection; model_pipeline.py:82-84).
    // Driver-side listing picks the files; `input_file_name` shows the
    // same predicate applied inside the scan.
    "f9_file_pruning" -> ((s, d) => {
      val paths = new java.io.File(d).listFiles()
        .map(_.getPath).filter(_.endsWith("nation.parquet")).sorted
      s.read.parquet(paths: _*)
        .filter(input_file_name().endsWith("nation.parquet"))
        .select(col("n_nationkey"), col("n_name"))
    }),

    // Z-order layout key: Morton code over (orderkey, partkey) — the
    // clustering value a z-ordered write range-partitions on, so scans
    // filtered on EITHER key prune files (LayoutSpec proves the
    // both-dimension locality; here the bit math is oracle-checked).
    "layout_zorder" -> ((s, d) => {
      val z = graft.operators.Layout.zValue(
        tbl(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        Seq("l_orderkey", "l_partkey"), bits = 8)
      z.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("zval"), shiftright(col("zval"), 12).as("zbucket"))
    }),

    // File-skipping index end-to-end: z-ordered write -> per-file
    // min/max stats -> index-pruned range read. Pruning is a sound
    // over-approximation, so the aggregate equals the plain filtered
    // aggregate the oracle computes (LayoutSpec proves files are
    // actually skipped; here the round trip is oracle-checked).
    "layout_file_skip" -> ((s, d) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_fskip_${math.abs(d.hashCode)}"
      graft.operators.Layout.zorderBy(
        tbl(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice")),
        Seq("l_orderkey", "l_partkey"), bits = 8, nSplits = 16)
        .drop("zval")
        .write.mode("overwrite").parquet(path)
      val stats = graft.operators.Layout.fileStats(s, path, Seq("l_orderkey"))
      graft.operators.Layout.prunedRead(s, path, stats,
        Seq(("l_orderkey", lit(5000L), lit(15000L))))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // The amortized form of layout_file_skip: the z-ordered layout and
    // its min/max file stats are built once per input (IndexCache) and
    // every later invocation times the PRUNED READ alone — the number a
    // lakehouse actually pays per query once the layout job has run.
    "layout_skip_probe" -> ((s, d) => {
      import graft.operators.{IndexCache, Layout}
      val path = IndexCache.getOrBuild(s"layout:$d") {
        // content-strength dir key (md5 prefix): hashCode collisions
        // between two data dirs in one JVM would cross their layouts
        val dirKey = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        val p = s"${sys.props("java.io.tmpdir")}/graft_fskip_amort_$dirKey"
        Layout.zorderBy(
          tbl(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice")),
          Seq("l_orderkey", "l_partkey"), bits = 8, nSplits = 16)
          .drop("zval")
          .write.mode("overwrite").parquet(p)
        p
      }
      val stats = IndexCache.getOrBuild(s"layout_stats:$d") {
        Layout.fileStats(s, path, Seq("l_orderkey")).localCheckpoint()
      }
      Layout.prunedRead(s, path, stats,
        Seq(("l_orderkey", lit(20000L), lit(30000L))))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }))

  val oracles: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'",
    "p1_select_alias" ->
      "SELECT n_nationkey AS id, n_name AS name, n_regionkey AS region_id FROM nation",
    "p2_conditional" ->
      "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing FROM customer",
    "p3_cast" ->
      "SELECT l_orderkey, l_linenumber, CAST(floor(l_quantity) AS BIGINT) AS qty_int FROM lineitem",
    "f1_eq_filter" ->
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "f2_in_filter" ->
      "SELECT p_partkey, p_brand FROM part WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')",
    "f3_disjunctive" ->
      "SELECT event_id, event_type FROM events WHERE event_type = 'error' OR value > 480.0",
    "f4_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%'",
    "f5_ne_null" ->
      "SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status FROM orders",
    "f7_conjunction" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_returnflag = 'R'",
    "f8_prefix_dispatch" ->
      "SELECT p_partkey, CASE WHEN p_type LIKE 'ECO%' THEN 'economy' WHEN p_type LIKE 'SMALL%' THEN 'small' ELSE 'other' END AS bucket FROM part",
    "f9_file_pruning" ->
      "SELECT n_nationkey, n_name FROM nation",
    "layout_zorder" -> {
      // Mirrors Layout.interleave bit-for-bit: column i bit b lands at
      // output position b * 2 + i.
      val zTerms = (0 until 8).flatMap(b => Seq(
        s"((b1 >> $b) & 1) * ${1L << (2 * b)}",
        s"((b2 >> $b) & 1) * ${1L << (2 * b + 1)}")).mkString(" + ")
      s"""WITH bnd AS (
            SELECT min(l_orderkey) AS lo1, max(l_orderkey) AS hi1,
                   min(l_partkey) AS lo2, max(l_partkey) AS hi2
            FROM lineitem),
          z AS (
            SELECT l_orderkey, l_linenumber, l_partkey,
              CAST(floor((l_orderkey - lo1)::DOUBLE / (hi1 - lo1 + 1)::DOUBLE * 256) AS BIGINT) AS b1,
              CAST(floor((l_partkey - lo2)::DOUBLE / (hi2 - lo2 + 1)::DOUBLE * 256) AS BIGINT) AS b2
            FROM lineitem CROSS JOIN bnd),
          zz AS (
            SELECT l_orderkey, l_linenumber, l_partkey,
              CAST($zTerms AS BIGINT) AS zval
            FROM z)
          SELECT l_orderkey, l_linenumber, l_partkey, zval,
            zval >> 12 AS zbucket
          FROM zz"""
    },
    "layout_file_skip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
           min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 15000""",
    "layout_skip_probe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
           min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem WHERE l_orderkey BETWEEN 20000 AND 30000""")
}
