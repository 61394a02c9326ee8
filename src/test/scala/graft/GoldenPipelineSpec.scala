package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Golden end-to-end pipeline test (SURVEY §5 plan, item 2): the five
  * stages chained over FIXTURES.md-shaped synthetic inputs, asserting
  * the final tables — clade assignment flows from ANI, annotations flow
  * through the protein-hash join into the ontology pivot, core flags
  * and the clade-partitioned layout come out right.
  */
class GoldenPipelineSpec extends SparkTestBase {

  import spark.implicits._

  test("genome prep -> annotate -> pangenome -> table build, end to end") {
    // --- stage 1: ANI tool output -> clade assignment
    val skaniOut = Seq(
      ("/g/userA.fna", "/r/GCF_1.fna", "98.7", "0.9", "0.9"),
      ("/g/userA.fna", "/r/GCF_2.fna", "96.2", "0.8", "0.8"),
      ("/g/userB.fna", "/r/GCF_2.fna", "99.1", "0.95", "0.93"))
      .toDF("query_file", "ref_file", "ani", "align_fraction_ref", "align_fraction_query")
    val cladeMap = Seq(("GCF_1", "cladeX"), ("GCF_2", "cladeY"))
      .toDF("genome_id", "clade_id")
    val assigned = GenomePrep.matchTopClade(
      GenomePrep.aniTransform(skaniOut), cladeMap)
    val clades = assigned.select("query_genome", "clade_id")
      .as[(String, String)].collect().toMap
    assert(clades == Map("userA" -> "cladeX", "userB" -> "cladeY"))

    // --- stage 2: features annotated by protein-hash identity
    val features = Annotate.withProteinHash(Seq(
      ("userA", "fA1", "MKTA"), ("userA", "fA2", "mkta*"), ("userB", "fB1", "GGGG"))
      .toDF("genome_id", "feature_id", "seq"), "seq")
    val store = features.filter(col("feature_id") === "fA1")
      .select(col("protein_hash").as("_id"),
        array(lit("K00002"), lit("K00001")).as("kos"))
    val annotated = Annotate.hashAnnotate(features, store, "kos", "ko_terms")
    val koByFeature = annotated.select("feature_id", "ko_terms")
      .as[(String, String)].collect().toMap
    // fA2 normalizes to fA1's hash -> inherits the same annotation
    assert(koByFeature("fA1") == "K00001; K00002")
    assert(koByFeature("fA2") == "K00001; K00002")
    assert(koByFeature("fB1") == "")

    // --- stage 3: cluster extension + core test
    val members = Seq(
      ("c1", "refG1"), ("c1", "refG2"), ("c2", "refG1")).toDF("cluster_id", "genome_id")
    val clusterHashes = features.filter(col("feature_id") === "fA1")
      .select(col("protein_hash").as("member_hash"))
      .withColumn("cluster_id", lit("c1"))
    val extended = Pangenome.extendClusters(features, clusterHashes)
    assert(extended.select("feature_id").as[String].collect().toSet == Set("fA1", "fA2"))
    val core = Pangenome.coreGenes(members)
      .select("cluster_id", "is_core").as[(String, Boolean)].collect().toMap
    assert(core == Map("c1" -> true, "c2" -> false))

    // --- stage 4: phenotype summary
    val sim = Seq(("userA", "CP"), ("userA", "FN")).toDF("genome_id", "class")
    val acc = PhenotypeTables.confusionSummary(sim).collect().head.getAs[Double]("accuracy")
    assert(acc == 0.5)

    // --- stage 5: ontology pivot + clade-partitioned output
    val ann = annotated.filter(length(col("ko_terms")) > 0)
      .select(col("feature_id"), lit("KO").as("term"), col("ko_terms").as("value"))
    val pivoted = TableBuild.ontologyPivot(ann)
    assert(pivoted.columns.toSet == Set("feature_id", "ontology_KO"))

    val outTable = assigned.select(col("query_genome").as("genome_id"), col("clade_id"))
    val path = s"${sys.props("java.io.tmpdir")}/graft_golden_pipeline"
    TableBuild.writeCladePartitioned(outTable, path)
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("clade_id=")).toSet
    assert(dirs == Set("clade_id=cladeX", "clade_id=cladeY"))
    val back = spark.read.parquet(path)
      .select("genome_id", "clade_id").as[(String, String)].collect().toMap
    assert(back == Map("userA" -> "cladeX", "userB" -> "cladeY"))
  }

  test("user_feature builder: golden row through swap, hash, profile, pivot") {
    // a '-'-strand TSV row (reference stores start > end pre-swap), a
    // '+' row with a profile hit, and a row with no protein
    val tsv = Seq(
      ("userA", "ctg1", "fA1", "al1", 900L, 500L, "-", "CDS", "ACGT", "mkta*"),
      ("userA", "ctg1", "fA2", "al2", 100L, 160L, "+", "CDS", "TTTT", "GGGG"),
      ("userB", "ctg2", "fB1", "al3", 10L, 40L, "+", "tRNA", "AAAA", ""))
      .toDF("genome", "contig", "gene_id", "aliases", "start", "end",
        "strand", "type", "dna_sequence", "protein_translation")
    val profile = Seq(("fA2", "c9", 1)).toDF(
      "feature_id", "pangenome_cluster", "is_core")
    val ann = Seq(("fA1", "KO", "K2"), ("fA1", "KO", "K1"), ("fA2", "EC", "1.1"))
      .toDF("feature_id", "term", "value")
    val out = TableBuild.userFeatureTable(tsv, profile, ann)
    // DDL order: fixed 14 columns then sorted ontology terms
    assert(out.columns.toSeq == Seq("genome", "contig", "feature_id",
      "aliases", "length", "start", "end", "strand", "type", "dna_sequence",
      "protein_sequence", "protein_sequence_hash", "pangenome_cluster",
      "pangenome_is_core", "ontology_EC", "ontology_KO"))
    val rows = out.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    val a1 = rows("fA1")
    // '-' strand: start/end swap, then length = end - start
    assert(a1.getAs[Long]("start") == 500L && a1.getAs[Long]("end") == 900L)
    assert(a1.getAs[Long]("length") == 400L)
    // protein hash = sha256(upper, trailing '*' stripped): MKTA
    assert(a1.getAs[String]("protein_sequence_hash") ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("MKTA".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(a1.getAs[String]("ontology_KO") == "K1; K2")
    assert(a1.getAs[String]("ontology_EC") == null)  // in ann, lacks EC
    assert(a1.getAs[String]("pangenome_cluster") == null) // no profile row
    val a2 = rows("fA2")
    assert(a2.getAs[Int]("pangenome_is_core") == 1)
    assert(a2.getAs[String]("ontology_EC") == "1.1")
    val b1 = rows("fB1")
    assert(b1.getAs[String]("protein_sequence_hash") == null) // empty protein
    assert(b1.getAs[String]("ontology_KO") == null) // absent from ann entirely
  }
}
