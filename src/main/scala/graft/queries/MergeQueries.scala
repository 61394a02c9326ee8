package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** MERGE INTO surface over `orders`: a deterministic change feed
  * (every 5th order flips to status 'X' with a 10% price bump) applied
  * as an update-wins upsert and as an SCD2 history merge. The feed is
  * derived from the table itself so the DuckDB oracle reproduces it
  * verbatim.
  */
object MergeQueries {

  private val FeedMod = 5
  private val UpdateTs = 100L

  val queries: Map[String, QueryFn] = Map(
    // Update-wins upsert: matched keys take the feed row, others pass.
    "merge_upsert" -> ((s, d) => {
      val base = tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round2(col("o_totalprice")).as("price"))
      val feed = tbl(s, d, "orders")
        .filter(col("o_orderkey") % FeedMod === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          round2(col("o_totalprice") * 1.1).as("price"))
      Merge.upsert(base, feed, Seq("o_orderkey"))
    }),

    // SCD2: the matched current row closes at the feed ts; the feed row
    // opens as the new current version.
    "merge_scd2" -> ((s, d) => {
      val base = tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          lit(0L).as("valid_from"),
          lit(null).cast("long").as("valid_to"))
      val feed = tbl(s, d, "orders")
        .filter(col("o_orderkey") % FeedMod === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          lit(UpdateTs).as("ts"))
      Merge.scd2(base, feed, Seq("o_orderkey"), "ts")
    }),

    // Snapshot diff (CDC reconstruction): two deterministic snapshots
    // of orders — keys %89==0 exist only in the new one (added), keys
    // %97==0 only in the old one (removed), keys %13==0 take a price
    // bump (changed) — classified in one full-outer key join.
    "snapshot_diff" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val oldSnap = o.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey"), round2(col("o_totalprice")).as("price"),
          col("o_orderstatus").as("status"))
      val newSnap = o.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 13 === 0, round2(col("o_totalprice") * 1.1))
            .otherwise(round2(col("o_totalprice"))).as("price"),
          col("o_orderstatus").as("status"))
      Merge.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("price", "status"))
    }))

  val oracles: Map[String, String] = Map(
    "merge_upsert" ->
      s"""WITH feed AS (
            SELECT o_orderkey, 'X' AS o_orderstatus,
              floor((o_totalprice * 1.1::DOUBLE) * 100 + 0.5) / 100 AS price
            FROM orders WHERE o_orderkey % $FeedMod = 0)
          SELECT o_orderkey, o_orderstatus,
            floor((o_totalprice) * 100 + 0.5) / 100 AS price
          FROM orders WHERE o_orderkey % $FeedMod <> 0
          UNION ALL
          SELECT * FROM feed""",
    "merge_scd2" ->
      s"""SELECT o_orderkey, o_orderstatus,
            CAST(0 AS BIGINT) AS valid_from,
            CASE WHEN o_orderkey % $FeedMod = 0
                 THEN CAST($UpdateTs AS BIGINT) ELSE NULL END AS valid_to
          FROM orders
          UNION ALL
          SELECT o_orderkey, 'X' AS o_orderstatus,
            CAST($UpdateTs AS BIGINT) AS valid_from,
            CAST(NULL AS BIGINT) AS valid_to
          FROM orders WHERE o_orderkey % $FeedMod = 0""",
    "snapshot_diff" ->
      """WITH olds AS (
            SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS price,
              o_orderstatus AS status
            FROM orders WHERE o_orderkey % 89 <> 0),
          news AS (
            SELECT o_orderkey,
              CASE WHEN o_orderkey % 13 = 0
                   THEN floor((o_totalprice * 1.1::DOUBLE) * 100 + 0.5) / 100
                   ELSE floor(o_totalprice * 100 + 0.5) / 100 END AS price,
              o_orderstatus AS status
            FROM orders WHERE o_orderkey % 97 <> 0)
          SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
            o.price AS old_price, o.status AS old_status,
            n.price AS new_price, n.status AS new_status,
            CASE WHEN o.o_orderkey IS NULL THEN 'added'
                 WHEN n.o_orderkey IS NULL THEN 'removed'
                 WHEN o.price IS DISTINCT FROM n.price
                   OR o.status IS DISTINCT FROM n.status THEN 'changed'
                 ELSE 'unchanged' END AS change_type
          FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey""")
}
