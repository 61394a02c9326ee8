package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Fixture tests for the five pipeline stages (SURVEY §7.4-7.5): each
  * stage is a pure DataFrame function, asserted against hand-computed
  * expected outputs mirroring the reference's semantics.
  */
class PipelineSpec extends SparkTestBase {

  import spark.implicits._

  test("GenomePrep.aniTransform strips paths and self-pairs") {
    val raw = Seq(
      ("/tmp/g/GCA_1.fna", "/tmp/r/GCF_9.fna", "98.5", "0.91", "0.88"),
      ("/tmp/g/GCA_1.fna", "/tmp/g/GCA_1.fna", "100.0", "1.0", "1.0"))
      .toDF("query_file", "ref_file", "ani", "align_fraction_ref", "align_fraction_query")
    val out = GenomePrep.aniTransform(raw).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "GCA_1" && out.head.getString(1) == "GCF_9")
    assert(out.head.getDouble(2) == 98.5)
  }

  test("GenomePrep.gtdbAccession maps GCA/GCF prefixes") {
    val df = Seq("GCA_1", "GCF_2", "X_3").toDF("id")
    val out = GenomePrep.gtdbAccession(df, "id", "acc")
      .select("acc").as[String].collect().toSet
    assert(out == Set("GB_GCA_1", "RS_GCF_2", "X_3"))
  }

  test("GenomePrep.matchTopClade takes the max-ANI hit per query") {
    val ani = Seq(
      ("q1", "r1", 97.0), ("q1", "r2", 99.0), ("q2", "r1", 95.0))
      .toDF("query_genome", "ref_genome", "ani")
    val clades = Seq(("r1", "cladeA"), ("r2", "cladeB")).toDF("genome_id", "clade_id")
    val out = GenomePrep.matchTopClade(ani, clades)
      .select("query_genome", "clade_id").as[(String, String)].collect().toMap
    assert(out == Map("q1" -> "cladeB", "q2" -> "cladeA"))
  }

  test("Annotate: protein hash join attaches sorted '; '-joined terms") {
    val feats = Annotate.withProteinHash(
      Seq(("f1", "mkt*"), ("f2", "MKT"), ("f3", "aaa")).toDF("feature_id", "seq"), "seq")
    // f1 and f2 normalize to the same hash (upper, trailing-* stripped)
    assert(feats.select("protein_hash").distinct().count() == 2)
    val store = feats.filter(col("feature_id") === "f1")
      .select(col("protein_hash").as("_id"),
        array(lit("K2"), lit("K1")).as("kos"))
    val out = Annotate.hashAnnotate(feats, store, "kos", "ko_terms")
      .select("feature_id", "ko_terms").as[(String, String)].collect().toMap
    assert(out("f1") == "K1; K2" && out("f2") == "K1; K2" && out("f3") == "")
  }

  test("Annotate.uniqueProteins dedups by hash keeping lowest id") {
    val feats = Annotate.withProteinHash(
      Seq(("f2", "MKT"), ("f1", "mkt*"), ("f3", "aaa")).toDF("feature_id", "seq"), "seq")
    val out = Annotate.uniqueProteins(feats, "feature_id")
      .select("rep_feature", "n_copies").as[(String, Long)].collect().toMap
    assert(out == Map("f1" -> 2L, "f3" -> 1L))
  }

  test("Pangenome.coreGenes flags clusters spanning all genomes") {
    val members = Seq(
      ("c1", "g1"), ("c1", "g2"), ("c1", "g3"),
      ("c2", "g1"), ("c2", "g2")).toDF("cluster_id", "genome_id")
    val out = Pangenome.coreGenes(members)
      .select("cluster_id", "is_core").as[(String, Boolean)].collect().toMap
    assert(out == Map("c1" -> true, "c2" -> false))
  }

  test("Pangenome.extendClusters assigns by majority vote, ties on id") {
    val user = Seq(("f1", "h1"), ("f1", "h2")).toDF("feature_id", "protein_hash")
    val clusters = Seq(
      ("h1", "cA"), ("h1", "cB"), ("h2", "cB"), ("h2", "cA"))
      .toDF("member_hash", "cluster_id")
    // f1 hits cA twice and cB twice -> tie -> lowest cluster id wins
    val out = Pangenome.extendClusters(user, clusters)
      .select("feature_id", "cluster_id").as[(String, String)].collect().toMap
    assert(out == Map("f1" -> "cA"))
  }

  test("Pangenome.fitnessStats aggregates over the condition join") {
    val fit = Seq(("g1", "s1", "f1", -1.5), ("g1", "s1", "f1", 0.5))
      .toDF("fitness_genome_id", "set_id", "feature_id", "fit")
    val cond = Seq(("g1", "s1", "cpd1")).toDF("fitness_genome_id", "set_id", "msid")
    val out = Pangenome.fitnessStats(fit, cond).collect().head
    assert(out.getAs[Double]("fit_max") == 0.5)
    assert(out.getAs[Double]("fit_min") == -1.5)
    assert(out.getAs[Long]("n") == 2L)
  }

  test("Memo.runIfAbsent skips the stage when committed output exists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toString
    val path = s"$dir/stage_out"
    var builds = 0
    def stage() = Memo.runIfAbsent(spark, path) {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    assert(stage().count() == 2 && builds == 1)
    val success = new java.io.File(path, "_SUCCESS")
    val mtime = success.lastModified()
    // second invocation: builder body never runs, nothing rewritten
    assert(stage().count() == 2)
    assert(builds == 1, "memoized stage must not rebuild")
    assert(success.lastModified() == mtime, "memoized stage must not rewrite")
    // a torn write (no _SUCCESS) reruns the stage
    assert(success.delete())
    assert(stage().count() == 2 && builds == 2)
  }

  test("PhenotypeTables.confusionSummary computes accuracy") {
    val sim = Seq(("g1", "CP"), ("g1", "CN"), ("g1", "FP"), ("g1", "CP"))
      .toDF("genome_id", "class")
    val out = PhenotypeTables.confusionSummary(sim).collect().head
    assert(out.getAs[Long]("cp") == 2 && out.getAs[Long]("fp") == 1)
    assert(out.getAs[Double]("accuracy") == 0.75)
  }

  test("PhenotypeTables.geneFvaClass takes most-constrained class") {
    val rxns = Seq(("g1", "blocked"), ("g1", "essential"), ("g2", "variable"))
      .toDF("gene_id", "fva_class")
    val out = PhenotypeTables.geneFvaClass(rxns)
      .select("gene_id", "gene_class").as[(String, String)].collect().toMap
    assert(out == Map("g1" -> "essential", "g2" -> "variable"))
  }

  test("PhenotypeTables.genePhenotypes merges sources with provenance") {
    val s1 = Seq(("g1", "cpdA", -2.0)).toDF("gene_id", "compound", "flux")
    val s2 = Seq(("g1", "cpdA", 1.0)).toDF("gene_id", "compound", "flux")
    val out = PhenotypeTables.genePhenotypes(Seq(s1 -> "fba", s2 -> "sim")).collect().head
    assert(out.getAs[String]("sources") == "fba;sim")
    assert(out.getAs[Double]("max_abs_flux") == 2.0)
  }

  test("TableBuild.aniMerge: earlier source wins on key conflict") {
    val s1 = Seq(("g1", "g2", 99.0)).toDF("genome1_id", "genome2_id", "ani")
    val s2 = Seq(("g1", "g2", 42.0), ("g3", "g4", 88.0))
      .toDF("genome1_id", "genome2_id", "ani")
    val out = TableBuild.aniMerge(Seq(s1, s2))
      .select("genome1_id", "ani").as[(String, Double)].collect().toMap
    assert(out == Map("g1" -> 99.0, "g3" -> 88.0))
  }

  test("TableBuild.ontologyPivot builds dynamic ontology_<TERM> columns") {
    val ann = Seq(
      ("f1", "GO", "GO:2"), ("f1", "GO", "GO:1"), ("f1", "EC", "1.1.1.1"),
      ("f2", "GO", "GO:3")).toDF("feature_id", "term", "value")
    val out = TableBuild.ontologyPivot(ann)
    assert(out.columns.toSet == Set("feature_id", "ontology_EC", "ontology_GO"))
    val f1 = out.filter(col("feature_id") === "f1").collect().head
    assert(f1.getAs[String]("ontology_GO") == "GO:1; GO:2")
  }

  test("TableBuild.ontologyTerms pivots the requested predicates") {
    val st = Seq(
      ("GO:1", "label", "alpha"), ("GO:1", "def", "first"),
      ("GO:1", "xref", "ignored"), ("GO:2", "label", "beta"))
      .toDF("subject", "predicate", "value")
    val out = TableBuild.ontologyTerms(st, Seq("label", "def"))
    assert(out.columns.toSet == Set("subject", "label", "def"))
    val go1 = out.filter(col("subject") === "GO:1").collect().head
    assert(go1.getAs[String]("label") == "alpha" && go1.getAs[String]("def") == "first")
  }

  test("TableBuild.withEcColumn enriches per prefix (KO map, GO xref, label regex, EC copy)") {
    val terms = Seq(
      ("KEGG", "KEGG:K00001", "", ""),
      ("KEGG", "KEGG:K00002", "", ""),
      ("GO", "GO:0000001", "", ""),
      ("seed.role", "seed.role:1", "kinase (EC 2.7.1.1) (TC 9.A.4)", ""),
      ("seed.role", "seed.role:2", "no patterns here", ""),
      ("EC", "EC:1.1.1.1", "", ""),
      ("PFAM", "PFAM:PF00001", "", ""))
      .toDF("ontology_prefix", "identifier", "label", "definition")
    val ko = Seq(("KEGG:K00001", "EC:9.9.9.9"), ("KEGG:K00001", "EC:1.2.3.4"),
      ("KEGG:K00001", "EC:9.9.9.9")).toDF("ko_id", "ec_id")
    val go = Seq(("GO:0000001", "EC:5.5.5.5")).toDF("go_id", "ec_id")
    val out = TableBuild.withEcColumn(terms, ko, go)
      .collect().map(r => r.getAs[String]("identifier") -> r.getAs[String]("ec")).toMap
    assert(out("KEGG:K00001") == "EC:1.2.3.4|EC:9.9.9.9") // sorted distinct
    assert(out("KEGG:K00002") == "")
    assert(out("GO:0000001") == "EC:5.5.5.5")
    assert(out("seed.role:1") == "EC:2.7.1.1|TC:9.A.4")   // EC matches before TC
    assert(out("seed.role:2") == "")
    assert(out("EC:1.1.1.1") == "EC:1.1.1.1")
    assert(out("PFAM:PF00001") == "")
  }

  test("TableBuild.writeCladePartitioned lays out clade directories") {
    val df = Seq(("g1", "cA"), ("g2", "cB")).toDF("genome_id", "clade_id")
    val path = s"${sys.props("java.io.tmpdir")}/graft_clade_part_test"
    TableBuild.writeCladePartitioned(df, path)
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("clade_id="))
    assert(dirs.toSet == Set("clade_id=cA", "clade_id=cB"))
    // partition pruning: reading one clade touches one directory
    val one = spark.read.parquet(path).filter(col("clade_id") === "cA")
    assert(one.count() == 1)
  }
}
