package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** int8 embedding quantization: reconstruction bound and end-to-end
  * cosine-ranking preservation on the real embeddings fixture.
  */
class VectorQuantSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.core.Lakehouse
    .table(spark, sfSmoke, "embeddings").select("vec_id", "embedding")

  test("per-element reconstruction error is bounded by scale/2") {
    val q = emb.withColumn("q", VectorOps.quantizeInt8(col("embedding")))
      .withColumn("max_err", aggregate(
        zip_with(VectorOps.dequantizeInt8(col("q")), col("embedding"),
          (dq, x) => abs(dq - x.cast("double"))),
        lit(0.0d), (acc, e) => greatest(acc, e)))
    val bad = q.filter(col("max_err") > col("q.scale") * 0.5 + 1e-12).count()
    assert(bad == 0)
    // scales are positive on the real fixture
    assert(q.filter(col("q.scale") <= 0).count() == 0)
  }

  test("zero vectors quantize to zero codes with zero scale") {
    val z = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
      .withColumn("q", VectorOps.quantizeInt8(col("embedding")))
    val r = z.select(col("q.scale"), col("q.codes")).head()
    assert(r.getDouble(0) == 0.0 && r.getSeq[Int](1).forall(_ == 0))
  }

  test("top-1 cosine neighbor survives int8 round-trip for >=90% of queries") {
    val base = emb.filter(col("vec_id") < 200)
    def top1(vecs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val a = vecs.select(col("vec_id").as("qid"), col("v").as("qv"))
      val b = vecs.select(col("vec_id").as("nid"), col("v").as("nv"))
      a.join(b, col("qid") =!= col("nid"))
        .withColumn("cos", VectorOps.dot(col("qv"), col("nv")) /
          (sqrt(VectorOps.dot(col("qv"), col("qv"))) *
            sqrt(VectorOps.dot(col("nv"), col("nv")))))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("nid"))))
        .filter(col("rn") === 1)
        .select("qid", "nid").as[(Long, Long)].collect().toMap
    }
    val exact = top1(base.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")))
    val viaInt8 = top1(base
      .withColumn("q", VectorOps.quantizeInt8(col("embedding")))
      .select(col("vec_id"), VectorOps.dequantizeInt8(col("q")).as("v")))
    val agree = exact.count { case (q, n) => viaInt8.get(q).contains(n) }
    assert(agree >= exact.size * 0.9,
      s"top-1 agreement ${agree}/${exact.size} below 90%")
  }

  test("probe of a persisted IVF index == one-shot ivfProbeTopK, bit-for-bit") {
    import graft.operators.Similarity
    val e = graft.core.Lakehouse
      .table(spark, sfSmoke, "embeddings").select("vec_id", "embedding")
    val idx = e.filter(col("vec_id") % 2 === 0)
    val bat = e.filter(col("vec_id") % 2 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long)].collect().toSet
    val oneShot = rows(Similarity.ivfProbeTopK(idx, bat,
      "vec_id", "embedding", k = 5, nCentroids = 8))
    val ix = Similarity.buildIvfIndex(idx, "vec_id", "embedding",
      nCentroids = 8)
    val viaIndex = rows(Similarity.probeIvfIndex(ix, bat,
      "vec_id", "embedding", k = 5))
    assert(viaIndex == oneShot)
    // the persisted cells frame survives a second probe unchanged
    assert(rows(Similarity.probeIvfIndex(ix, bat,
      "vec_id", "embedding", k = 5)) == oneShot)
  }
}
