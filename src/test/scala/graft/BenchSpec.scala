package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench's stall-self-defense record parser (no Spark
  * session needed — pure text parsing). */
class BenchSpec extends AnyFunSuite {

  // the committed rN_final_full.json shape: pretty-printed, per-query
  // blocks under an outer "queries" object
  private val record =
    """{
      | "metric": "total",
      | "queries": {
      |  "a10_fraction": {
      |   "max": 0.387,
      |   "med": 0.251,
      |   "min": 0.246
      |  },
      |  "graph_kcore": {
      |   "max": 4.5,
      |   "med": 4.2,
      |   "min": 4.0
      |  }
      | },
      | "sf": "/root/testdata/sf0.1",
      | "value": 254.993
      |}""".stripMargin

  test("parseMedians reads every query, including the first one") {
    val m = Bench.parseMedians(record)
    // regression: with [^}] instead of [^{}] the outer "queries" key
    // swallowed the first query's block — a10_fraction had NO entry
    // (so no stall protection) and a phantom "queries" entry existed
    assert(m.get("a10_fraction").contains(0.251))
    assert(m.get("graph_kcore").contains(4.2))
    assert(!m.contains("queries"))
    assert(m.size == 2)
  }

  test("parseMedians reads the bench's own single-line last_full shape") {
    val line = """{"metric":"total","value":1.0,"unit":"sec","queries":{""" +
      """"q_heavy":{"min":0.9,"med":1.0,"max":1.2},""" +
      """"q_light":{"min":0.1,"med":0.2,"max":0.3}},""" +
      """"sf":"/root/testdata/sf0.1","host_mhz":2100}"""
    val m = Bench.parseMedians(line)
    assert(m == Map("q_heavy" -> 1.0, "q_light" -> 0.2))
  }
}
