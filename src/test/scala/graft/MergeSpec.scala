package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "A", 0L, Option.empty[Long]),
    (2L, "B", 0L, Option.empty[Long]),
    (3L, "old", 0L, Some(50L)),
    (3L, "C", 50L, Option.empty[Long]))
    .toDF("id", "v", "valid_from", "valid_to")

  private def feed = Seq((2L, "B2", 100L), (4L, "D", 100L))
    .toDF("id", "v", "ts")

  test("scd2: every key has exactly one open version; history is kept") {
    val merged = Merge.scd2(base, feed, Seq("id"), "ts")
    val open = merged.filter(col("valid_to").isNull)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(open == Map(1L -> "A", 2L -> "B2", 3L -> "C", 4L -> "D"))
    // point-in-time read at t=75: pre-update world
    val at75 = merged.filter(col("valid_from") <= 75 &&
        (col("valid_to").isNull || col("valid_to") > 75))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(at75 == Map(1L -> "A", 2L -> "B", 3L -> "C"))
    // closed row carries the update timestamp
    val closed = merged.filter(col("id") === 2 && col("valid_to").isNotNull)
      .select("valid_to").as[Long].head()
    assert(closed == 100L)
  }

  test("scd2: multi-row feed keeps one open version per key (latest wins)") {
    val multi = Seq((2L, "B1", 60L), (2L, "B2", 100L), (4L, "D0", 80L),
      (4L, "D", 100L)).toDF("id", "v", "ts")
    val merged = Merge.scd2(base, multi, Seq("id"), "ts")
    val open = merged.filter(col("valid_to").isNull)
      .select("id", "v").as[(Long, String)].collect()
    assert(open.length == open.map(_._1).distinct.length,
      s"duplicate open versions: ${open.mkString(",")}")
    assert(open.toMap == Map(1L -> "A", 2L -> "B2", 3L -> "C", 4L -> "D"))
    // the matched current row closed at the LATEST feed ts
    val closed = merged.filter(col("id") === 2 && col("valid_to").isNotNull &&
        col("valid_from") === 0).select("valid_to").as[Long].head()
    assert(closed == 100L)
  }

  test("merge degrades to a shuffle join past the broadcast ceiling") {
    val b = base.filter(col("valid_to").isNull).select("id", "v")
    val up = Merge.upsert(b, feed.select("id", "v"), Seq("id"),
      maxBroadcastBytes = 0L)
    assert(up.as[(Long, String)].collect().toMap ==
      Map(1L -> "A", 2L -> "B2", 3L -> "C", 4L -> "D"))
    val upPlan = up.queryExecution.executedPlan.toString
    assert(!upPlan.contains("BroadcastExchange"),
      s"oversized feed must not broadcast:\n$upPlan")
    assert(upPlan.contains("ShuffledHashJoin") || upPlan.contains("SortMergeJoin"),
      s"oversized feed must shuffle-join:\n$upPlan")

    val sc = Merge.scd2(base, feed, Seq("id"), "ts", maxBroadcastBytes = 0L)
    val scPlan = sc.queryExecution.executedPlan.toString
    assert(!scPlan.contains("BroadcastExchange"),
      s"oversized scd2 feed must not broadcast:\n$scPlan")
    val open = sc.filter(col("valid_to").isNull)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(open == Map(1L -> "A", 2L -> "B2", 3L -> "C", 4L -> "D"))
  }

  test("upsert: update wins, new keys append, feed side broadcasts") {
    val b = base.filter(col("valid_to").isNull).select("id", "v")
    val merged = Merge.upsert(b, feed.select("id", "v"), Seq("id"))
    assert(merged.as[(Long, String)].collect().toMap ==
      Map(1L -> "A", 2L -> "B2", 3L -> "C", 4L -> "D"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"feed side should broadcast:\n$plan")
  }

  test("snapshotDiff: classifies added/removed/changed/unchanged; null-safe") {
    val oldSnap = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, Option.empty[Double], "C"), (4L, Some(40.0), "D"))
      .toDF("id", "price", "status")
    val newSnap = Seq((1L, Some(10.0), "A"), (2L, Some(25.0), "B"),
      (3L, Some(30.0), "C"), (5L, Some(50.0), "E"))
      .toDF("id", "price", "status")
    val diff = Merge.snapshotDiff(oldSnap, newSnap, Seq("id"),
      Seq("price", "status"))
    val byId = diff.select("id", "change_type").as[(Long, String)]
      .collect().toMap
    assert(byId == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "removed", 5L -> "added"))
    // old/new values ride along on both sides of the join
    val r2 = diff.filter(col("id") === 2)
      .select("old_price", "new_price").as[(Double, Double)].head()
    assert(r2 == ((20.0, 25.0)))
    val r5 = diff.filter(col("id") === 5).select("old_price")
      .as[Option[Double]].head()
    assert(r5.isEmpty)
  }
}
