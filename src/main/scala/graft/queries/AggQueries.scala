package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Aggregations (SURVEY §2.4 A1-A12 + the pivots of §1.3).
  *
  * All are single-shuffle groupBys with map-side partial aggregation;
  * count-distinct against a global scalar (a2) broadcasts the 1-row
  * global side instead of reshuffling the per-group side.
  */
object AggQueries {

  val queries: Map[String, QueryFn] = Map(
    // A14: CUBE grouping sets — sub/grand totals in ONE pass (the
    // OLAP form the viewer's per-dimension totals would otherwise
    // re-query per dimension); grouping_id disambiguates a real NULL
    // group from a rolled-up one.
    "a14_cube" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round2(sum(col("l_extendedprice"))).as("revenue"))
    }),

    // The flagship: TPC-H Q1-shaped pricing summary (reference grouped
    // aggregation shape: KBDatalakeUtils.py:717-731).
    "q1_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round2(sum(col("l_quantity"))).as("sum_qty"),
          round2(sum(col("l_extendedprice"))).as("sum_base"),
          round4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("n"))
    }),

    // A1: count per group (reference: pangenome.py:316-318).
    "a1_count_group" -> ((s, d) => {
      tbl(s, d, "events").groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // A2: per-group count-distinct vs global count-distinct — the
    // core-gene test (reference: build_berdl_db.py:553-556).
    "a2_core_flag" -> ((s, d) => {
      Relational.coreFlag(tbl(s, d, "lineitem"), "l_partkey", "l_returnflag")
    }),

    // A3: multi-stat numeric aggregation (reference: KBDatalakeUtils.py:717-731).
    "a3_multi_stat" -> ((s, d) => {
      tbl(s, d, "lineitem").groupBy(col("l_suppkey")).agg(
        round2(max(col("l_extendedprice"))).as("max_price"),
        round2(min(col("l_extendedprice"))).as("min_price"),
        round2(avg(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("n"))
    }),

    // A4: distinct (reference: datalake_table.py:561-562).
    "a4_distinct" -> ((s, d) => {
      tbl(s, d, "customer").select(col("c_nationkey"), col("c_mktsegment")).distinct()
    }),

    // A5/W4: arg-max per group with deterministic tie-break
    // (reference clade pick: prep_genome_set.py:160-169).
    "a5_argmax" -> ((s, d) => {
      Relational.topKPerGroup(tbl(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
        .select(col("o_custkey"), col("o_orderkey").as("best_order"),
          round2(col("o_totalprice")).as("best_price"))
    }),

    // A6: conditional counting / confusion-matrix style
    // (reference: KBDatalakeUtils.py:579-623).
    "a6_conditional_count" -> ((s, d) => {
      tbl(s, d, "events").groupBy(col("user_id")).agg(
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"),
        count(lit(1)).as("n"))
        .withColumn("purchase_rate", round4(col("purchases") / col("n")))
    }),

    // A7: set-collect rendered as a sorted joined string
    // (reference: datalake_table.py:365,468).
    "a7_set_join_string" -> ((s, d) => {
      tbl(s, d, "customer").groupBy(col("c_nationkey"))
        .agg(Relational.sortedSetJoin(col("c_mktsegment"), "; ").as("segments"))
    }),

    // A8: priority-max aggregation — most-constrained class fold
    // (reference: KBDatalakeUtils.py:1113-1147).
    "a8_priority_max" -> ((s, d) => {
      Relational.priorityMax(tbl(s, d, "lineitem"), Seq("l_orderkey"),
        "l_returnflag", Seq("N" -> 1, "A" -> 2, "R" -> 3), "worst_flag")
    }),

    // A9: max-of-abs aggregation (reference: KBDatalakeUtils.py:1106-1146).
    "a9_max_abs" -> ((s, d) => {
      tbl(s, d, "events").groupBy(col("user_id"))
        .agg(round2(max(abs(col("value") - 250.0))).as("max_dev"))
    }),

    // A10: fraction-of-set aggregation (reference: KBDatalakeUtils.py:707-711).
    "a10_fraction" -> ((s, d) => {
      tbl(s, d, "events").groupBy(col("event_type"))
        .agg(round4(avg(when(col("value") > 250.0, 1.0).otherwise(0.0))).as("frac_high"))
    }),

    // A11/U2: union of provenance-tagged sources accumulated per key
    // (reference: KBDatalakeUtils.py:648-801).
    "a11_source_accumulate" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val s1 = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("orders").as("source"))
      val s2 = ev.filter(col("event_type") === "error")
        .select(col("user_id"), lit("logs").as("source"))
      val s3 = ev.filter(col("event_type") === "click" && col("value") > 400)
        .select(col("user_id"), lit("clicks").as("source"))
      s1.unionByName(s2).unionByName(s3)
        .groupBy(col("user_id"))
        .agg(Relational.sortedSetJoin(col("source"), ";").as("sources"),
          count(lit(1)).as("n"))
    }),

    // A12: set-overlap fraction (reference module completeness:
    // prediction/kegg_module.py:69-80).
    "a12_overlap_fraction" -> ((s, d) => {
      tbl(s, d, "documents").groupBy(col("lang")).agg(
        round(avg(when(arrays_overlap(split(col("text"), " "),
          array(lit("spark"), lit("vector"))), 1.0).otherwise(0.0)), 4).as("frac"))
    }),

    // A13: file-level record counts — FASTA headers counted from the
    // raw text representation (reference: build_berdl_db.py:35-51
    // counts '>' lines for contigs, lines-1 for features). The
    // write-then-count round trip is the operator itself (a sink demo
    // + file-level audit), isolated in Fasta.headerCount; the write is
    // parallel (one file per partition), the count reads the whole
    // directory.
    "a13_file_counts" -> ((s, d) => {
      val fasta = tbl(s, d, "documents").select(
        concat(lit("doc_"), col("doc_id")).as("id"),
        col("lang").as("description"),
        upper(regexp_replace(col("text"), " ", "")).as("seq"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_fasta_counts_${math.abs(d.hashCode)}"
      graft.sources.Fasta.headerCount(s, fasta, path)
    }),

    // Static long→wide pivot (reference ontology pivot shape:
    // datalake_table.py:310-316) with explicit value list.
    "pivot_static" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round2(sum(col("l_quantity"))))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .na.fill(0.0, Seq("qty_f", "qty_o"))
    }),

    // Dynamic pivot: values discovered from the data, deterministic and
    // bounded (reference: datalake_table.py:310-316 two-pass term scan).
    "pivot_dynamic" -> ((s, d) => {
      Relational.dynamicPivot(
        tbl(s, d, "events").select(col("user_id"), col("event_type")),
        Seq("user_id"), "event_type", count(lit(1)), maxValues = 100)
        .na.fill(0)
    }),

    // Dynamic pivot PAST the cap: the 25 p_brand values exceed
    // maxValues = 10, so the first 10 (sorted) become columns and the
    // other 15 aggregate into one 'other' overflow column (SURVEY §7.4
    // hard-part 1; reference discovers terms unbounded,
    // datalake_table.py:310-316 — the cap+overflow keeps the schema
    // bounded at 100 TB term cardinalities).
    "pivot_overflow" -> ((s, d) => {
      Relational.dynamicPivot(
        tbl(s, d, "part").select((col("p_size") % 5).as("size_band"),
          col("p_brand")),
        Seq("size_band"), "p_brand", count(lit(1)), maxValues = 10,
        overflowCol = Some("other"))
        .na.fill(0)
    }))

  val oracles: Map[String, String] = Map(
    "a14_cube" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*)::BIGINT AS n,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS revenue
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base, floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc, count(*) AS n
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "a1_count_group" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "a2_core_flag" ->
      """SELECT l_partkey, count(DISTINCT l_returnflag) AS n_members,
           count(DISTINCT l_returnflag) = (SELECT count(DISTINCT l_returnflag) FROM lineitem) AS is_core
         FROM lineitem GROUP BY l_partkey""",
    "a3_multi_stat" ->
      """SELECT l_suppkey, floor((max(l_extendedprice)) * 100 + 0.5) / 100 AS max_price, floor((min(l_extendedprice)) * 100 + 0.5) / 100 AS min_price,
           floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price, count(*) AS n
         FROM lineitem GROUP BY l_suppkey""",
    "a4_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "a5_argmax" ->
      """SELECT o_custkey, o_orderkey AS best_order, floor((o_totalprice) * 100 + 0.5) / 100 AS best_price FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn = 1""",
    "a6_conditional_count" ->
      """SELECT user_id, purchases, errors, n, floor((purchases / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000 AS purchase_rate FROM (
           SELECT user_id, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors, count(*) AS n
           FROM events GROUP BY user_id)""",
    "a7_set_join_string" ->
      """SELECT c_nationkey, array_to_string(list_sort(list(DISTINCT c_mktsegment)), '; ') AS segments
         FROM customer GROUP BY c_nationkey""",
    "a8_priority_max" ->
      """SELECT l_orderkey, CASE max(CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 WHEN 'R' THEN 3 ELSE 0 END)
           WHEN 1 THEN 'N' WHEN 2 THEN 'A' WHEN 3 THEN 'R' END AS worst_flag
         FROM lineitem GROUP BY l_orderkey""",
    "a9_max_abs" ->
      "SELECT user_id, floor((max(abs(value - 250.0))) * 100 + 0.5) / 100 AS max_dev FROM events GROUP BY user_id",
    "a10_fraction" ->
      """SELECT event_type, floor((avg(CASE WHEN value > 250.0 THEN 1.0 ELSE 0.0 END)) * 10000 + 0.5) / 10000 AS frac_high
         FROM events GROUP BY event_type""",
    "a11_source_accumulate" ->
      """WITH u AS (
           SELECT user_id, 'orders' AS source FROM events WHERE event_type = 'purchase'
           UNION ALL SELECT user_id, 'logs' FROM events WHERE event_type = 'error'
           UNION ALL SELECT user_id, 'clicks' FROM events WHERE event_type = 'click' AND value > 400)
         SELECT user_id, array_to_string(list_sort(list(DISTINCT source)), ';') AS sources, count(*) AS n
         FROM u GROUP BY user_id""",
    "a12_overlap_fraction" ->
      """SELECT lang, round(avg(CASE WHEN list_has_any(string_split(text, ' '), ['spark','vector'])
           THEN 1.0 ELSE 0.0 END), 4) AS frac
         FROM documents GROUP BY lang""",
    "a13_file_counts" ->
      "SELECT count(*) AS n_seqs FROM documents",
    "pivot_static" ->
      """SELECT l_returnflag,
           floor((coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0)) * 100 + 0.5) / 100 AS qty_f,
           floor((coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0)) * 100 + 0.5) / 100 AS qty_o
         FROM lineitem GROUP BY l_returnflag""",
    "pivot_dynamic" ->
      """SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY user_id""",
    "pivot_overflow" -> {
      val kept = Seq("Brand#1", "Brand#10", "Brand#11", "Brand#12", "Brand#13",
        "Brand#14", "Brand#15", "Brand#16", "Brand#17", "Brand#18")
      val cells = kept.map(b =>
        s"""CAST(sum(CASE WHEN p_brand = '$b' THEN 1 ELSE 0 END) AS BIGINT) AS "$b"""")
      val inList = kept.map(b => s"'$b'").mkString(", ")
      s"""SELECT p_size % 5 AS size_band,
           ${cells.mkString(",\n           ")},
           CAST(sum(CASE WHEN p_brand NOT IN ($inList) THEN 1 ELSE 0 END) AS BIGINT) AS other
         FROM part GROUP BY p_size % 5"""
    })
}
