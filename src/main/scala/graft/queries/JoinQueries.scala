package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.operators.Relational

/** Joins (SURVEY §2.3 J1-J10).
  *
  * Scale notes: dimension sides (part, nation, region, customer at these
  * ratios) are broadcast — no shuffle of the fact table. The only
  * shuffling joins are fact-to-fact (j1 self-join), which co-partition
  * on the join key; at 100 TB those keys are the bucketing columns
  * (SURVEY §4.2).
  */
object JoinQueries {

  val queries: Map[String, QueryFn] = Map(
    // J1: inner equi-join on a composite key (reference: KBDatalakeUtils.py:713-715).
    "j1_inner_composite" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val left = li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").as("qty"))
      val right = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("price"))
      left.join(right, Seq("l_orderkey", "l_linenumber"), "inner")
    }),

    // J2: broadcast dimension-enrichment join (reference: build_berdl_db.py:469-528).
    "j2_broadcast_dim" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val p = tbl(s, d, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // J3: content-hash identity join — the reference's signature
    // protein-hash join (build_berdl_db.py:567-583, hash_seq.py:4-27),
    // re-keyed on sha256 of normalized document text.
    "j3_hash_identity" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val dim = docs.select(Hashes.proteinHash(col("text")).as("content_hash"),
        col("lang").as("dim_lang"))
      val fact = docs.select(col("doc_id"), Hashes.proteinHash(col("text")).as("content_hash"))
      fact.join(dim, Seq("content_hash"), "inner")
        .select(col("doc_id"), col("content_hash"), col("dim_lang"))
    }),

    // J4: multiway star join (reference CDM 6-table join: query_genome_local.py:46-105).
    "j4_star" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val o = tbl(s, d, "orders")
      val c = tbl(s, d, "customer")
      val n = tbl(s, d, "nation")
      val r = tbl(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J5: left join with default via coalesce (reference: query_genome_local.py:95).
    "j5_left_coalesce" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val big = tbl(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_big"))
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), coalesce(col("n_big"), lit(0L)).as("big_items"))
    }),

    // J6: semi-join (reference: datalake_table.py:560-571).
    "j6_semi" -> ((s, d) => {
      val c = tbl(s, d, "customer")
      val hi = tbl(s, d, "orders").filter(col("o_totalprice") > 50000)
      c.join(hi, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J7: anti-join (reference: build_berdl_db.py:754-767).
    "j7_anti" -> ((s, d) => {
      val c = tbl(s, d, "customer")
      val f = tbl(s, d, "orders").filter(col("o_orderstatus") === "F")
      c.join(f, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J8: first-wins keyed merge of prioritized sources
    // (reference ANI-source merge: datalake_table.py:216-257).
    "j8_first_wins" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val src1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), lit("src1").as("src"),
          col("l_quantity").as("val"))
      val src2 = li.select(col("l_orderkey"), col("l_linenumber"), lit("src2").as("src"),
        col("l_extendedprice").as("val"))
      // (l_orderkey, l_linenumber) is not unique in lineitem, so break
      // within-priority ties on the payload to stay deterministic.
      Relational.firstWinsMerge(Seq(src1, src2), Seq("l_orderkey", "l_linenumber"),
        tieBreak = Seq(col("val")))
    }),

    // J9: keyed lookup join — a small request set resolved against the
    // fact table on a composite key (reference: build_berdl_db.py:937-944
    // pandas set_index + .loc; in Spark a broadcast equi-join).
    "j9_keyed_lookup" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val requests = li.filter(col("l_quantity") === 50.0)
        .select(col("l_orderkey"), col("l_linenumber"))
      requests.join(li, Seq("l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round2(col("l_extendedprice")).as("price"))
    }),

    // As-of join (beyond the reference): each click resolved to the
    // latest preceding purchase of the same user — union + running
    // last_value, not a range join (see Relational.asofJoin).
    "j_asof_join" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Relational.asofJoin(clicks, purchases, "user_id", "ts_us", Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("asof_event_id"))
    }),

    // Banded range join (beyond the reference): clicks within ±10 min
    // of each purchase by the same user, counted per purchase.
    "j_range_join" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
      Relational.rangeJoin(purchases, clicks, "user_id", "ts_us",
        window = 600000000L) // 10 min in µs
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_nearby_clicks"))
    }),

    // J10: cross-source multi-value merge — union of value sets rendered
    // as a sorted ';'-joined string (reference: build_berdl_db.py:481-501).
    "j10_multivalue_merge" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(concat_ws(";", array_sort(array_distinct(
          concat(collect_set(col("l_returnflag")), collect_set(col("l_linestatus"))))))
          .as("merged"))
    }))

  val oracles: Map[String, String] = Map(
    "j1_inner_composite" ->
      """SELECT a.l_orderkey, a.l_linenumber, a.l_quantity AS qty, b.l_extendedprice AS price
         FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber""",
    "j2_broadcast_dim" ->
      """SELECT p_brand, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
    "j3_hash_identity" ->
      """WITH h AS (SELECT doc_id, lang, sha256(upper(regexp_replace(text, '\*$', ''))) AS content_hash FROM documents)
         SELECT f.doc_id, f.content_hash, d.lang AS dim_lang
         FROM h f JOIN h d ON f.content_hash = d.content_hash""",
    "j4_star" ->
      """SELECT r_name, n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue, count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "j5_left_coalesce" ->
      """SELECT o_orderkey, coalesce(x.n_big, 0) AS big_items
         FROM orders LEFT JOIN (SELECT l_orderkey, count(*) AS n_big FROM lineitem WHERE l_quantity > 45 GROUP BY 1) x
         ON o_orderkey = x.l_orderkey""",
    "j6_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)""",
    "j7_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "j8_first_wins" ->
      """WITH u AS (
           SELECT l_orderkey, l_linenumber, 'src1' AS src, l_quantity AS val, 1 AS pri
           FROM lineitem WHERE l_returnflag = 'R'
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'src2' AS src, l_extendedprice AS val, 2 AS pri
           FROM lineitem)
         SELECT l_orderkey, l_linenumber, src, val FROM (
           SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY pri, val) AS rn FROM u)
         WHERE rn = 1""",
    "j9_keyed_lookup" ->
      """SELECT l.l_orderkey, l.l_linenumber, floor((l.l_extendedprice) * 100 + 0.5) / 100 AS price
         FROM (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity = 50.0) r
         JOIN lineitem l ON r.l_orderkey = l.l_orderkey AND r.l_linenumber = l.l_linenumber""",
    "j_asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS asof_event_id
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts_us >= r.ts_us""",
    "j_range_join" ->
      """SELECT p.event_id, count(*) AS n_nearby_clicks
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND abs(p.ts_us - c.ts_us) <= 600000000
         GROUP BY p.event_id""",
    "j10_multivalue_merge" ->
      """SELECT l_orderkey, array_to_string(list_sort(list_distinct(list(l_returnflag) || list(l_linestatus))), ';') AS merged
         FROM lineitem GROUP BY l_orderkey""")
}
