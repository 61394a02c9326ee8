package graft.serve

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Raw-SQL paged serving — the server side of the reference's
  * `delta/tables/query` endpoint (POST `{query, limit, offset}` →
  * rows + `pagination.has_more`; berdl/berdl/utils/berdl_api.py:17-34,
  * berdl/berdl/query/query_pangenome_berdl.py:92-153). The reference
  * CLIENT is `sources/PagedSource`; this is what answers it when the
  * engine itself is the lakehouse server (SURVEY §3.3).
  *
  * Semantics mirrored from the reference endpoint:
  *   - the SQL runs as-is (`spark.sql` over the registered lakehouse
  *     views — Catalyst is the planner, pushdown/pruning apply);
  *   - `limit`/`offset` page the RESULT, they are not spliced into the
  *     caller's SQL text;
  *   - `has_more` is exact and costs ONE extra row, never a count():
  *     the page fetches `limit + 1` rows and reports whether the
  *     extra materialized. (The reference pays a full re-query per
  *     page; a count() here would rescan the lakehouse at every page
  *     of a 1B-row junction table.)
  *
  * Determinism note, same contract as the reference: pagination is
  * only stable if the query orders its rows — the caller's SQL should
  * carry ORDER BY (the reference's templated queries key on clade then
  * rely on storage order; SURVEY W1's serving path always sorts).
  */
object SqlEndpoint {

  final case class Page(rows: Seq[Row], hasMore: Boolean)

  /** Register the lakehouse tables once per session/directory. */
  def register(spark: SparkSession, sfDir: String): Unit =
    graft.core.Lakehouse.registerAll(spark, sfDir)

  /** The paged plan (lazy — callers compose or collect). */
  def pageFrame(spark: SparkSession, sql: String, limit: Int,
                offset: Int): DataFrame = {
    require(limit > 0 && offset >= 0, s"bad page: limit=$limit offset=$offset")
    spark.sql(sql).offset(offset).limit(limit + 1)
  }

  /** One page of results + the exact has_more flag. */
  def page(spark: SparkSession, sql: String, limit: Int,
           offset: Int): Page = {
    val got = pageFrame(spark, sql, limit, offset).collect()
    Page(got.take(limit).toSeq, got.length > limit)
  }
}
