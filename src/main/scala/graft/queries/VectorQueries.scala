package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table: exact
  * brute-force cosine top-k (baseline) and random-hyperplane LSH
  * bucketed ANN (the scale path). The LSH hyperplanes are deterministic
  * (seed 42) and inlined into the oracle SQL as literal arrays, so both
  * engines bucket identically.
  */
object VectorQueries {

  private val K = 5
  private val NPlanes = 6
  private val Dim = 64
  private lazy val planes: Seq[Seq[Double]] = Similarity.hyperplanes(NPlanes, Dim)

  val queries: Map[String, QueryFn] = Map(
    // Exact top-k for a small query set against the full corpus.
    "ann_bruteforce_topk" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", K)
    }),

    // LSH-bucketed ANN over the whole corpus (within-bucket top-k).
    "ann_lsh_topk" -> ((s, d) => {
      Similarity.lshTopK(tbl(s, d, "embeddings"), "vec_id", "embedding", K, planes)
    }))

  private def dotSql(x: String, y: String): String =
    s"list_sum(list_transform(generate_series(1, $Dim), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def planeLit(p: Seq[Double]): String = p.mkString("[", ", ", "]")

  /** bucket = concat of sign bits of dot(v, plane_j). */
  private def bucketSql(v: String): String =
    planes.map { p =>
      s"(CASE WHEN ${dotSql(v, planeLit(p))} >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  val oracles: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      s"""SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < 10)
          WHERE rank <= $K""",
    "ann_lsh_topk" ->
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings)
          SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
          WHERE rank <= $K""")
}
