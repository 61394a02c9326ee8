package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{RastMap, TableBuild}

/** Fixture tests for the RAST→SEED role-dictionary mapper and the
  * ontology relationship/definition builders (SURVEY §2.9; reference
  * KBDatalakeUtils.py:2742-2897, berdl/ontology/transform.py:5-29,
  * KBDatalakeUtils.py:2466-2690).
  */
class RastMapSpec extends SparkTestBase {

  import spark.implicits._

  private val dict = RastMap.roleDictionary(
    Seq(
      ("Alcohol dehydrogenase", "seed.role:0000000000001"),
      ("Thioredoxin", "seed.role:0000000000002"),
      ("Glutaredoxin", "seed.role:0000000000003"),
      // punctuation/case variant normalizing identically to a 4th id:
      ("ATP synthase, F1 subunit", "seed.role:0000000000004"))
      .toDF("label", "role_id"),
    "label", "role_id")

  private def mapAll(ann: String): Set[(String, String)] = {
    val out = RastMap.mapAllAnnotations(
      Seq((1, ann)).toDF("k", "annotation"), "annotation", dict)
    out.select("matched_part", "seed_role_id")
      .as[(String, String)].collect().toSet
  }

  test("direct exact match maps the whole annotation") {
    assert(mapAll("Alcohol dehydrogenase") ==
      Set(("Alcohol dehydrogenase", "seed.role:0000000000001")))
  }

  test("multi-function ' / ' annotation maps ALL matching parts") {
    assert(mapAll("Thioredoxin / Glutaredoxin") == Set(
      ("Thioredoxin", "seed.role:0000000000002"),
      ("Glutaredoxin", "seed.role:0000000000003")))
  }

  test("mixed separators ' @ ' and '; ' both split") {
    assert(mapAll("Thioredoxin @ no such role; Alcohol dehydrogenase") == Set(
      ("Thioredoxin", "seed.role:0000000000002"),
      ("Alcohol dehydrogenase", "seed.role:0000000000001")))
  }

  test("normalize_role matching: case and punctuation variants hit") {
    assert(mapAll("atp synthase F1 subunit!") ==
      Set(("atp synthase F1 subunit!", "seed.role:0000000000004")))
  }

  test("unmatched annotations produce no rows") {
    assert(mapAll("completely unknown function") == Set.empty)
  }

  test("a normalized label mapping to several ids returns all of them") {
    val multi = RastMap.roleDictionary(
      Seq(("Heme oxygenase", "seed.role:A"), ("heme-oxygenase", "seed.role:B"))
        .toDF("label", "role_id"), "label", "role_id")
    val out = RastMap.mapAllAnnotations(
      Seq((1, "Heme oxygenase")).toDF("k", "annotation"), "annotation", multi)
      .select("seed_role_id").as[String].collect().toSet
    assert(out == Set("seed.role:A", "seed.role:B"))
  }

  test("ontologyRelationships applies every reference filter branch") {
    val statements = Seq(
      ("GO:1", "rdfs:subClassOf", "GO:2"),           // kept, relabeled is_a
      ("GO:1", "rdfs:subClassOf", "GO:1"),           // self-referential: dropped
      ("GO:1", "rdfs:subClassOf", "_:blank7"),       // blank node: dropped
      ("EC:1.1.1.1", "rdfs:subClassOf", "EC:1.1.1.-"), // EC hierarchy: dropped
      ("SO:5", "rdfs:subClassOf", "SO:6"),           // SO hierarchy: dropped
      ("GO:1", "rdfs:label", "some label"),          // irrelevant predicate: dropped
      ("seed.role:9", "<https://modelseed.org/ontology/enables_reaction>",
        "seed.reaction:rxn1"),                       // kept, relabeled
      ("GO:1", "rdfs:subClassOf", "GO:2"),           // duplicate: deduped
      ("UNKNOWN:1", "rdfs:subClassOf", "GO:2"))      // subject not a term: dropped
      .toDF("subject", "predicate", "object")
    val termIds = Seq("GO:1", "EC:1.1.1.1", "SO:5", "seed.role:9").toDF("id")
    val out = TableBuild.ontologyRelationships(statements, termIds)
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("GO:1", "is_a", "GO:2"),
      ("seed.role:9", "enables_reaction", "seed.reaction:rxn1")))
  }

  test("ontologyDefinitions keeps only present prefixes") {
    val terms = Seq("GO", "GO", "seed.role").toDF("ontology_prefix")
    val out = TableBuild.ontologyDefinitions(terms)
      .select("ontology_prefix").as[String].collect().toSet
    assert(out == Set("GO", "seed.role"))
  }
}
