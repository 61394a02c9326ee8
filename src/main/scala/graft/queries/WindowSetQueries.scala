package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Windows, sorts, pagination (SURVEY §2.5 W1-W5) and set operations
  * (§2.6 U1-U4).
  *
  * Pagination uses a total order (unique tie-break column) so
  * offset/limit is deterministic under parallelism — the reference gets
  * this implicitly from SQLite's single-threaded scan; an engine that
  * shuffles must make it explicit.
  */
object WindowSetQueries {

  val queries: Map[String, QueryFn] = Map(
    // W1/W2: sort + limit/offset pagination (reference: query_pangenome_berdl.py:99-125).
    "w1_pagination" -> ((s, d) => {
      Relational.page(tbl(s, d, "orders"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), limit = 50, offset = 100)
        .select(col("o_orderkey"), round2(col("o_totalprice")).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    }),

    // W2: global sort by a requested column/direction (reference: viewer
    // sort_column/sort_order) — unique tie-break key appended so the
    // limit is deterministic under parallel scan order.
    "w2_global_sort" -> ((s, d) => {
      tbl(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(200)
        .select(col("o_orderkey"), round2(col("o_totalprice")).as("price"))
    }),

    // W3: deterministic multi-key output ordering (reference:
    // KBDatalakeUtils.py:2702 sort_values before emit).
    "w3_deterministic_order" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .orderBy(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_linenumber"))
        .limit(500)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_linenumber"))
    }),

    // W4: top-k (k=3) per group (reference top-1: prep_genome_set.py:160-169).
    "w4_topk_per_group" -> ((s, d) => {
      Relational.topKPerGroup(tbl(s, d, "supplier"), Seq("s_nationkey"),
        Seq(col("s_acctbal").desc, col("s_suppkey").asc), 3)
        .select(col("s_nationkey"), col("s_suppkey"), round2(col("s_acctbal")).as("bal"))
    }),

    // W5: running aggregate window (frame spec — beyond the reference's
    // surface, needed by the serving layer's cumulative views).
    "w5_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, d, "events")
        .withColumn("running_value", round2(sum(col("value")).over(w)))
        .select(col("event_id"), col("user_id"), col("running_value"))
    }),

    // U1: UNION ALL preserving duplicates (reference: query_pangenome_berdl.py:248-268).
    "u1_union_all" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      o.filter(col("o_totalprice") > 40000).select(col("o_orderkey"))
        .unionByName(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")))
    }),

    // U2: union with provenance column (reference: datalake_table.py:216-257).
    "u2_union_provenance" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      o.filter(col("o_totalprice") > 40000)
        .select(col("o_orderkey"), lit("high_value").as("kind"))
        .unionByName(o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("finished").as("kind")))
    }),

    // U3: intersection (reference: prediction/phenotype.py:61-66).
    "u3_intersect" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),

    // U4: except (reference: build_berdl_db.py:756-758).
    "u4_except" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      o.filter(col("o_totalprice") > 55000).select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
    }),

    // W6: keyset (cursor) pagination — the deep-scroll-safe serving
    // form: "the 50 orders after cursor (o_orderdate, o_orderkey) =
    // (1995-06-01, 400)" filters first (pushdown-eligible) instead of
    // ordering-and-discarding an offset prefix.
    "w6_keyset_page" -> ((s, d) => {
      Relational.keysetPage(tbl(s, d, "orders"),
        Seq(col("o_orderdate") -> lit("1995-06-01").cast("timestamp"),
          col("o_orderkey") -> lit(400L)), limit = 50)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          round2(col("o_totalprice")).as("price"))
    }),

    // Contiguous global ids (training-example numbering, sorted-export
    // row addressing) WITHOUT the single-partition window the naive
    // row_number() plans to: range partition → parallel per-partition
    // windows → broadcast prefix offsets (Relational.contiguousIds).
    "ids_contiguous" -> ((s, d) => {
      Relational.contiguousIds(
        tbl(s, d, "documents").select(col("doc_id"), col("source")),
        Seq(col("doc_id")), "seq_id")
    }))

  val oracles: Map[String, String] = Map(
    "w1_pagination" ->
      """SELECT o_orderkey, floor((o_totalprice) * 100 + 0.5) / 100 AS price, strftime(o_orderdate, '%Y-%m-%d') AS order_date
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 100""",
    "w2_global_sort" ->
      """SELECT o_orderkey, floor((o_totalprice) * 100 + 0.5) / 100 AS price
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 200""",
    "w3_deterministic_order" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
         FROM lineitem ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber LIMIT 500""",
    "w4_topk_per_group" ->
      """SELECT s_nationkey, s_suppkey, floor((s_acctbal) * 100 + 0.5) / 100 AS bal FROM (
           SELECT *, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
           FROM supplier) WHERE rn <= 3""",
    "w5_running_sum" ->
      """SELECT event_id, user_id, floor((sum(value) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_value
         FROM events""",
    "u1_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 40000
         UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'""",
    "u2_union_provenance" ->
      """SELECT o_orderkey, 'high_value' AS kind FROM orders WHERE o_totalprice > 40000
         UNION ALL SELECT o_orderkey, 'finished' AS kind FROM orders WHERE o_orderstatus = 'F'""",
    "u3_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "u4_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 55000
         EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "w6_keyset_page" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           floor((o_totalprice) * 100 + 0.5) / 100 AS price
         FROM orders
         WHERE o_orderdate > TIMESTAMP '1995-06-01'
            OR (o_orderdate = TIMESTAMP '1995-06-01' AND o_orderkey > 400)
         ORDER BY o_orderdate, o_orderkey LIMIT 50""",
    "ids_contiguous" ->
      """SELECT doc_id, source,
           row_number() OVER (ORDER BY doc_id) - 1 AS seq_id
         FROM documents""")
}
