package graft.queries

import graft.serve._

/** Serving-layer DSL queries (SURVEY §2.8): each runs a viewer-shaped
  * `ScanRequest` through the `TableScanner` compiler; the oracle is the
  * SQL the reference's table scanner would execute for that request.
  */
object ServeQueries {

  val queries: Map[String, QueryFn] = Map(
    // quick-filter sugar ">=X" + sort + limit/offset pagination.
    "dsl_page_filter" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "orders"), ScanRequest(
        table = "orders",
        colFilter = Map("o_totalprice" -> ">=30000"),
        sortColumn = Some("o_orderkey"), sortOrder = "ASC",
        limit = Some(50), offset = Some(10)))
    }),

    // advanced filter panel: between + in + like, conjunctive.
    "dsl_adv_filters" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "part"), ScanRequest(
        table = "part",
        filters = Seq(
          ColumnFilter("p_size", "between", Some("5"), Nil, Some("45")),
          ColumnFilter("p_brand", "not_in", None, Seq("Brand#5", "Brand#10", "Brand#15")),
          ColumnFilter("p_name", "like", Some("%bolt%")))))
    }),

    // group_by + aggregations (count/min/max kept integer/exact).
    "dsl_group_agg" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "lineitem"), ScanRequest(
        table = "lineitem",
        groupBy = Seq("l_returnflag"),
        aggregations = Seq(
          Aggregation("count", "l_orderkey", "n"),
          Aggregation("sum", "l_linenumber", "sum_lines"),
          Aggregation("min", "l_quantity", "min_qty"),
          Aggregation("max", "l_quantity", "max_qty"))))
    }),

    // global cross-column search (viewer search_value).
    "dsl_global_search" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "nation"), ScanRequest(
        table = "nation", searchValue = Some("nation_1")))
    }),

    // quick-filter comma list -> IN, negation -> NOT IN.
    "dsl_quick_in" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "customer"), ScanRequest(
        table = "customer",
        colFilter = Map(
          "c_mktsegment" -> "BUILDING,MACHINERY",
          "c_nationkey" -> "!3,7")))
    }),

    // quick-filter range "X..Y" -> between.
    "dsl_quick_range" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "events"), ScanRequest(
        table = "events",
        colFilter = Map("value" -> "100..200", "event_type" -> "purchase")))
    }),

    // aggregation-panel distinct_count function per group.
    "dsl_distinct_count" -> ((s, d) => {
      TableScanner.scan(tbl(s, d, "lineitem"), ScanRequest(
        table = "lineitem",
        groupBy = Seq("l_returnflag"),
        aggregations = Seq(
          Aggregation("distinct_count", "l_suppkey", "n_suppliers"),
          Aggregation("distinct_count", "l_linestatus", "n_statuses"))))
    }),

    // stats-viewer endpoint: one-pass per-column stats.
    "dsl_column_stats" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      TableScanner.columnStats(tbl(s, d, "lineitem"), "l_linenumber")
        .withColumn("avg", round4(col("avg")))
    }),

    // stats-viewer percentile panel: exact interpolated quantiles.
    "dsl_percentiles" -> ((s, d) => {
      TableScanner.columnPercentiles(tbl(s, d, "orders"), "o_totalprice",
        Seq(0.25, 0.5, 0.75, 0.9))
    }),

    // total_count endpoint: filtered row count before paging.
    "dsl_total_count" -> ((s, d) => {
      TableScanner.totalCount(tbl(s, d, "lineitem"), ScanRequest(
        table = "lineitem",
        filters = Seq(ColumnFilter("l_returnflag", "ne", Some("N")))))
    }),

    // Raw SQL passthrough: the reference's remote SQL endpoint executes
    // arbitrary SQL against the lakehouse (query_pangenome_berdl.py:
    // 92-153, berdl_api.py:17-34); here `spark.sql` over the registered
    // views IS the server side — the oracle runs the identical text.
    "sql_passthrough" -> ((s, d) => {
      graft.core.Lakehouse.registerAll(s, d)
      s.sql(
        """SELECT n_name, count(*) AS n_suppliers, floor(sum(s_acctbal) * 100 + 0.5) / 100 AS total_bal
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_name""")
    }))

  val oracles: Map[String, String] = Map(
    "dsl_page_filter" ->
      """SELECT * FROM orders WHERE o_totalprice >= 30000
         ORDER BY o_orderkey ASC LIMIT 50 OFFSET 10""",
    "dsl_adv_filters" ->
      """SELECT * FROM part
         WHERE p_size BETWEEN 5 AND 45
           AND p_brand NOT IN ('Brand#5','Brand#10','Brand#15')
           AND p_name LIKE '%bolt%'""",
    "dsl_group_agg" ->
      """SELECT l_returnflag, count(l_orderkey) AS n, CAST(sum(l_linenumber) AS BIGINT) AS sum_lines,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
         FROM lineitem GROUP BY l_returnflag""",
    "dsl_global_search" ->
      """SELECT * FROM nation
         WHERE contains(lower(CAST(n_nationkey AS VARCHAR)), 'nation_1')
            OR contains(lower(n_name), 'nation_1')
            OR contains(lower(CAST(n_regionkey AS VARCHAR)), 'nation_1')""",
    "dsl_quick_in" ->
      """SELECT * FROM customer
         WHERE c_mktsegment IN ('BUILDING','MACHINERY')
           AND c_nationkey NOT IN (3, 7)""",
    "dsl_quick_range" ->
      """SELECT event_id, user_id, event_type, value, props, epoch_us(ts) AS ts_us FROM events
         WHERE event_type = 'purchase' AND value >= 100 AND value <= 200""",
    "dsl_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_linestatus) AS n_statuses
         FROM lineitem GROUP BY l_returnflag""",
    "dsl_column_stats" ->
      """SELECT count(*) AS row_count,
           CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
           count(DISTINCT l_linenumber) AS distinct_count,
           CAST(min(l_linenumber) AS VARCHAR) AS min,
           CAST(max(l_linenumber) AS VARCHAR) AS max,
           floor(avg(l_linenumber) * 10000 + 0.5) / 10000 AS avg
         FROM lineitem""",
    "dsl_percentiles" -> {
      def q(p: Double) =
        s"SELECT $p::DOUBLE AS p, floor(quantile_cont(o_totalprice, $p) * 10000 + 0.5) / 10000 AS value FROM orders"
      Seq(0.25, 0.5, 0.75, 0.9).map(q).mkString(" UNION ALL ")
    },
    "dsl_total_count" ->
      "SELECT count(*) AS total_count FROM lineitem WHERE l_returnflag <> 'N'",
    "sql_passthrough" ->
      """SELECT n_name, count(*) AS n_suppliers, floor(sum(s_acctbal) * 100 + 0.5) / 100 AS total_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""")
}
