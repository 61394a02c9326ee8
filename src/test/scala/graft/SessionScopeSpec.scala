package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.SessionScope

/** Contract of the scoped-conf helper behind labelPropagation's mode
  * fallback raise and the wedge pipeline's Bloom-cap raise: overrides
  * bind ONLY inside the scope, the caller's session never observes
  * them, and a body that tries to smuggle lazy work out (which would
  * re-execute under default confs) is refused loudly. */
class SessionScopeSpec extends SparkTestBase {
  import spark.implicits._

  private val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  test("withConf: override visible inside the scope, never on the caller") {
    val before = spark.conf.getOption(Key)
    var insideValue: Option[String] = None
    var insideBase: Option[String] = None
    val out = SessionScope.withConf(
      Seq(1L, 2L, 3L).toDF("v"), Map(Key -> "777")) { df =>
      insideValue = df.sparkSession.conf.getOption(Key)
      // CONCURRENT visibility: while the scope is live, the base
      // session still reads its own (unchanged) value — the property
      // the old shared-conf save/set/restore guard could not give
      insideBase = spark.conf.getOption(Key)
      df.groupBy().agg(sum(col("v")).as("s")).localCheckpoint()
    }
    assert(insideValue.contains("777"), "override must bind inside the scope")
    assert(insideBase == before,
      "the caller's session must never observe the override, even mid-scope")
    assert(spark.conf.getOption(Key) == before,
      "no leakage after the scope returns")
    // the returned frame is rebound to the caller's session and usable
    assert(out.sparkSession eq spark)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("withConf: a lazy-return body is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      SessionScope.withConf(Seq(1L).toDF("v"), Map(Key -> "777")) { df =>
        df.select((col("v") + 1).as("v")) // no checkpoint: lazy plan
      }
    }
    assert(e.getMessage.contains("lineage-truncated"),
      s"refusal must explain itself: ${e.getMessage}")
  }

  test("headUnderConf: one action under the override, value crosses back") {
    val before = spark.conf.getOption(Key)
    val row = SessionScope.headUnderConf(
      Seq(5L, 7L).toDF("v").groupBy().agg(sum(col("v")).as("s")),
      Map(Key -> "777"))
    assert(row.getLong(0) == 12L)
    assert(spark.conf.getOption(Key) == before, "no leakage")
  }

  test("headUnderConf: bloom builds past the default runtime-filter caps keep their fp") {
    // The reason headUnderConf exists: BloomFilterAggregate silently
    // Math.min's its sizing against session caps defaulting to
    // 4M items / 2^26 bits. An 8M-item, 80M-bit build exceeds BOTH;
    // under the defaults the filter comes out hashed for 4M items in
    // 67M bits (~3.5% fp on the real 8M) — under raised caps it keeps
    // the designed ~0.8%. Pin the raised behavior with a measured fp
    // on 100k known NON-members, with margin (< 2%): if a refactor
    // ever drops the scoped raise, this triples and fails.
    import org.apache.spark.sql.graftx.{BloomScreen, SessionScope}
    val items = 8000000L
    val bits = 80000000L
    val bf = SessionScope.headUnderConf(
      spark.range(items).agg(
        BloomScreen.bloomAgg(col("id"), items, bits).as("bf")),
      Map("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" ->
        items.toString,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
          bits.toString)).getAs[Array[Byte]](0)
    val probes = 100000L
    val falsePos = spark.range(items, items + probes)
      .filter(BloomScreen.mightContain(bf, col("id"))).count()
    val fp = falsePos.toDouble / probes
    assert(fp < 0.02,
      f"over-cap bloom build lost its sizing: fp $fp%.4f (designed ~0.008; " +
        "the default-cap clamp measures ~0.035)")
  }

  test("withConf: checkpointed result never re-executes the scoped work") {
    // the returned frame must be a block scan — collecting it twice
    // (and after the scope is gone) yields the same rows with no
    // dependence on the clone's conf still being live
    val out = SessionScope.withConf(
      Seq(("a", 1L), ("a", 2L), ("b", 4L)).toDF("k", "v"),
      Map(Key -> "777")) { df =>
      df.groupBy(col("k")).agg(sum(col("v")).as("s")).localCheckpoint()
    }
    val first = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val second = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(first == second && first == Set(("a", 3L), ("b", 4L)))
  }
}
