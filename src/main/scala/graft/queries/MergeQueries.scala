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
          FROM orders WHERE o_orderkey % $FeedMod = 0""")
}
