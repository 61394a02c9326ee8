package graft

import org.apache.spark.sql.functions._
import graft.core.Lakehouse

/** The SURVEY §4.2 co-located-join layout: two tables bucketed on the
  * join key with equal bucket counts must equi-join with no shuffle
  * exchange on either side. */
class BucketedJoinSpec extends SparkTestBase {

  test("equi-join of co-bucketed tables plans without exchanges") {
    val li = Lakehouse.table(spark, sfSmoke, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Lakehouse.table(spark, sfSmoke, "orders")
      .select("o_orderkey", "o_totalprice")

    for (t <- Seq("li_bkt", "o_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    Lakehouse.writeBucketed(li, "li_bkt", "l_orderkey", buckets = 8)
    Lakehouse.writeBucketed(o, "o_bkt", "o_orderkey", buckets = 8)

    // Force the shuffle-join path the layout is built for (at real
    // scale neither side broadcasts) and check the bucketed scans
    // co-locate: a sort-merge join with NO shuffle exchange.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == li.count()) // every lineitem matches its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
