package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.operators.Relational

/** Stage 5 — final table generation (reference:
  * berdl/berdl/tables/datalake_table.py + ontology tables
  * KBDatalakeUtils.py:2169-2740). Everything here is pure dataframe
  * work; each output table writes as Parquet partitioned by clade so
  * the serving layer's clade-equality scans prune partitions.
  */
object TableBuild {

  /** ANI table from several JSON-derived sources, callers pass sources
    * in EFFECTIVE priority order (highest first). Note the reference's
    * conflict policy is mixed (datalake_table.py:216-257): the
    * kepangenomes / fitness / phenotypes dicts each assign
    * `ani_rows[pk] = ...` unconditionally — so among those three the
    * LAST loaded wins (phenotypes > fitness > kepangenomes) — while
    * ani_members.json alone is gated on `pk not in ani_rows` (fills
    * gaps only). Expressed here as one first-wins merge with sources
    * pre-ordered [phenotypes, fitness, kepangenomes, members]. */
  def aniMerge(sources: Seq[DataFrame]): DataFrame =
    Relational.firstWinsMerge(sources, Seq("genome1_id", "genome2_id"),
      tieBreak = Seq(col("ani")))

  /** Sorted `'; '`-joined set, NULL over an empty group — matching the
    * reference's "None when the key has no values for this term"
    * (datalake_table.py:361-365). Needed because Spark rewrites
    * complex-agg pivots to conditional aggregation, where an absent
    * (key, term) cell yields collect_set = [] (→ ""), not null. */
  private def joinedSetOrNull(c: org.apache.spark.sql.Column) =
    when(count(c) > 0, concat_ws("; ", array_sort(collect_set(c))))

  /** Ontology long→wide pivot: one `ontology_<TERM>` column per term
    * discovered in the data, cells = sorted `'; '`-joined values
    * (reference two-pass term scan + per-row dict build:
    * datalake_table.py:310-366). */
  def ontologyPivot(annotations: DataFrame, maxTerms: Int = 1000): DataFrame = {
    val prefixed = annotations.withColumn("__term",
      concat(lit("ontology_"), col("term")))
    Relational.dynamicPivot(prefixed, Seq("feature_id"), "__term",
      joinedSetOrNull(col("value")), maxTerms)
  }

  /** RDF statements → term dimension tables (reference:
    * KBDatalakeUtils.py:2367-2552): filter the triple store to the
    * wanted subjects/predicates, pivot predicate → column. */
  def ontologyTerms(statements: DataFrame, predicates: Seq[String],
                    maxSubjects: Int = 100000): DataFrame = {
    val filtered = statements.filter(col("predicate").isin(predicates: _*))
    Relational.dynamicPivot(filtered, Seq("subject"), "predicate",
      joinedSetOrNull(col("value")), maxSubjects)
  }

  /** Static ontology-prefix descriptions (reference:
    * KBDatalakeUtils.py:2663-2672 — a hardcoded dictionary). */
  val ontologyPrefixDescriptions: Seq[(String, String)] = Seq(
    "GO" -> "Gene Ontology - standardized vocabulary for gene and protein functions",
    "EC" -> "Enzyme Commission numbers - classification of enzymes by reaction type",
    "SO" -> "Sequence Ontology - vocabulary for sequence features",
    "PFAM" -> "Protein Families database - protein domain families",
    "KEGG" -> "KEGG Orthologs - ortholog groups linking genes across species",
    "COG" -> "Clusters of Orthologous Groups - protein functional categories",
    "seed.role" -> "SEED Role Ontology - functional roles from RAST annotation",
    "seed.reaction" -> "SEED Reaction Ontology - biochemical reactions from ModelSEED")

  /** `ontology_relationships` dimension table from the RDF triple store
    * (reference: KBDatalakeUtils.py:2466-2520): keep only the relevant
    * predicates on known term subjects, drop self-referential edges and
    * blank-node objects, drop the EC/SO subClassOf parent hierarchy,
    * relabel predicates to their short names, dedup.
    *
    * `termIds` is the (small) known-term dimension — broadcast semi
    * join, so the triple store side never shuffles. */
  def ontologyRelationships(statements: DataFrame, termIds: DataFrame): DataFrame = {
    val predicateLabels = Map(
      "rdfs:subClassOf" -> "is_a",
      "<https://modelseed.org/ontology/enables_reaction>" -> "enables_reaction")
    val labelExpr = predicateLabels.foldLeft(col("predicate")) {
      case (acc, (raw, short)) => when(col("predicate") === raw, short).otherwise(acc)
    }
    statements
      .filter(col("predicate").isin(predicateLabels.keys.toSeq: _*))
      .join(broadcast(termIds.select(col(termIds.columns.head).as("__tid"))),
        col("subject") === col("__tid"), "left_semi")
      .filter(col("subject") =!= col("object"))
      .filter(!col("object").startsWith("_:"))
      .filter(!(col("predicate") === "rdfs:subClassOf" &&
        (col("subject").startsWith("EC:") || col("subject").startsWith("SO:"))))
      .select(col("subject"), labelExpr.as("predicate"), col("object"))
      .distinct()
  }

  /** `ontology_definitions` dimension table: the static prefix
    * descriptions restricted to prefixes actually present in the term
    * table (reference: KBDatalakeUtils.py:2674-2690). */
  def ontologyDefinitions(terms: DataFrame, prefixCol: String = "ontology_prefix"): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val defs = ontologyPrefixDescriptions.toDF("ontology_prefix", "definition")
    defs.join(broadcast(terms.select(col(prefixCol).as("ontology_prefix")).distinct()),
      Seq("ontology_prefix"), "left_semi")
  }

  /** Ontology-term harvest patterns (reference regex dictionary:
    * KBDatalakeUtils.py:2241-2252): (pattern, match group, canonical
    * prefix). Group 1 of the RAST-style `(EC 1.1.1.5)` pattern captures
    * the bare number; the prefix is prepended whenever the match lacks
    * it (KEGG `K00001`, PFAM `PF00001`, RAST EC captures). Shared with
    * the differential oracle so both engines harvest identically. */
  val termPatterns: Seq[(String, Int, String)] = Seq(
    ("GO:\\d+", 0, "GO:"),
    ("EC:[\\d.-]+", 0, "EC:"),
    ("\\(EC[:\\s]*([\\d.-]+)\\)", 1, "EC:"),
    ("(?:KEGG:)?K\\d{5}", 0, "KEGG:"),
    ("COG:(?:COG\\d+|[A-Z])", 0, "COG:"),
    ("(?:PFAM:)?PF\\d+(?:\\.\\d+)?", 0, "PFAM:"),
    ("SO:\\d+", 0, "SO:"),
    ("seed\\.role:\\d+", 0, "seed.role:"))

  /** Harvest normalized ontology identifiers out of free-text columns
    * (reference cell-scan: KBDatalakeUtils.py:2281-2312, which loops
    * rows×columns×patterns in pandas). Here it is ONE map-side
    * projection: every (column × pattern) extraction runs in the same
    * pass over the row, flattened and exploded — no per-pattern rescan,
    * no shuffle; at 100 TB the harvest cost is the scan itself. */
  def harvestTerms(df: DataFrame, textCols: Seq[String]): DataFrame = {
    val matches: Seq[org.apache.spark.sql.Column] = for {
      c <- textCols
      (pat, grp, pfx) <- termPatterns
    } yield transform(regexp_extract_all(col(c), lit(pat), lit(grp)),
      m => when(m.startsWith(pfx), m).otherwise(concat(lit(pfx), m)))
    df.select(explode(flatten(array(matches: _*))).as("identifier"))
  }

  /** `ontology_terms` dimension table (reference assembly:
    * KBDatalakeUtils.py:2406-2421 enrichment + 2700-2702
    * `drop_duplicates(subset=['identifier'])` and
    * `sort_values(['ontology_prefix','identifier'])`): one row per
    * distinct harvested identifier, enriched with `rdfs:label` /
    * `IAO:0000115` values from the statements triple store (empty
    * string when absent, like the reference), prefix = text before the
    * first colon.
    *
    * Scale shape: the harvest side dedups with one hash shuffle; the
    * label/definition lookups are predicate-filtered slices of the
    * statements table, broadcast — the big side never reshuffles for
    * the joins. */
  def ontologyTerms(harvested: DataFrame, statements: DataFrame): DataFrame = {
    def lookup(pred: String, out: String) =
      statements.filter(col("predicate") === pred)
        .groupBy(col("subject")).agg(min(col("object")).as(out))
    val labels = lookup("rdfs:label", "__label")
    val defs = lookup("IAO:0000115", "__def")
    harvested.select(col("identifier")).distinct()
      .withColumn("ontology_prefix",
        regexp_extract(col("identifier"), "^([^:]+):", 1))
      .join(broadcast(labels), col("identifier") === labels("subject"), "left")
      .drop("subject")
      .join(broadcast(defs), col("identifier") === defs("subject"), "left")
      .drop("subject")
      .select(col("ontology_prefix"), col("identifier"),
        coalesce(col("__label"), lit("")).as("label"),
        coalesce(col("__def"), lit("")).as("definition"))
      .orderBy(col("ontology_prefix"), col("identifier"))
  }

  /** EC cross-reference column for `ontology_terms` (reference:
    * KBDatalakeUtils.py:2555-2660): per prefix —
    *   KEGG → pipe-joined ECs from the KO→EC mapping file;
    *   GO   → pipe-joined ECs from `oio:hasDbXref` statements;
    *   seed.role → `(EC x)` / `(TC x)` patterns extracted from the
    *   label (reference regexes :2610-2611, EC matches before TC);
    *   EC   → the identifier itself; anything else → ''.
    * Where the reference's list order is nondeterministic
    * (`list(set(...))` at :2604, file order at :2570-2575) this joins
    * SORTED DISTINCT values so the result is engine-reproducible.
    *
    * `koToEc` is (ko_id, ec_id) long form; `goToEc` (go_id, ec_id).
    * Both are reference-file-small → broadcast; the term table side
    * never shuffles for the enrichment. */
  def withEcColumn(terms: DataFrame, koToEc: DataFrame, goToEc: DataFrame): DataFrame = {
    def pipeJoined(m: DataFrame, idCol: String, out: String) =
      m.groupBy(col(idCol))
        .agg(concat_ws("|", array_sort(collect_set(col("ec_id")))).as(out))
    val ecLabel = transform(
      regexp_extract_all(col("label"), lit("\\(EC\\s*([\\d.-]+)\\)"), lit(1)),
      m => concat(lit("EC:"), m))
    val tcLabel = transform(
      regexp_extract_all(col("label"), lit("\\(TC\\s*([\\d.\\w]+)\\)"), lit(1)),
      m => concat(lit("TC:"), m))
    terms
      .join(broadcast(pipeJoined(koToEc, "ko_id", "__ko_ec")),
        col("identifier") === col("ko_id"), "left").drop("ko_id")
      .join(broadcast(pipeJoined(goToEc, "go_id", "__go_ec")),
        col("identifier") === col("go_id"), "left").drop("go_id")
      .withColumn("ec",
        when(col("ontology_prefix") === "KEGG", coalesce(col("__ko_ec"), lit("")))
          .when(col("ontology_prefix") === "GO", coalesce(col("__go_ec"), lit("")))
          .when(col("ontology_prefix") === "seed.role",
            array_join(concat(ecLabel, tcLabel), "|"))
          .when(col("ontology_prefix") === "EC", col("identifier"))
          .otherwise(lit("")))
      .drop("__ko_ec", "__go_ec")
      .orderBy(col("ontology_prefix"), col("identifier"))
  }

  // ---------------------------------------------------------------
  // Per-table output builders (reference: datalake_table.py:84-751) —
  // each reproduces its table's fixed DDL column set, order and types.
  // ---------------------------------------------------------------

  /** Select+cast the DDL column list, in DDL order — the Spark
    * equivalent of each builder's fixed CREATE TABLE. */
  private def conform(df: DataFrame, ddl: Seq[(String, String)]): DataFrame =
    df.select(ddl.map { case (c, t) => col(c).cast(t).as(c) }: _*)

  /** Restrict a table to the job's genome set — every reference
    * builder filters `genome_id in self.filter_genome_ids`
    * (datalake_table.py:566-571, 614, 640, 680, 718). The allowed set
    * is job-small by convention, so it broadcasts — but size-gated
    * (shuffle semi join past the ceiling), never unconditionally. */
  def filterGenomes(df: DataFrame, allowed: DataFrame,
                    idCol: String = "genome_id"): DataFrame =
    df.join(
      Relational.broadcastIfSmall(
        allowed.select(col(allowed.columns.head).as("__gid")).distinct()),
      col(idCol) === col("__gid"), "left_semi")

  /** `user_feature` table (reference assembly datalake_table.py:369-469,
    * DDL :471-501): per-feature rows from the user genome TSV with
    * strand-swapped coordinates, length, protein hash, pangenome
    * profile lookup and dynamic `ontology_<TERM>` columns.
    *
    * `genomeTsv` carries (genome, contig, gene_id, start, end, strand,
    * aliases, type, dna_sequence, protein_translation); `profile`
    * (feature_id, pangenome_cluster, is_core); `annotations`
    * (feature_id, term, value) long-form. Feature ids are globally
    * unique (the reference's per-genome files carry genome-qualified
    * ids). The profile is clade-small by convention → size-gated
    * broadcast lookup (a many-genome submission degrades to a shuffle
    * join instead of OOMing); the ontology pivot is feature-sized →
    * shuffle join on feature_id. */
  def userFeatureTable(genomeTsv: DataFrame, profile: DataFrame,
                       annotations: DataFrame, maxTerms: Int = 1000): DataFrame = {
    // reference: start/end swap on '-' BEFORE length = end - start
    // (datalake_table.py:430-444)
    val (s2, e2) = Relational.strandSwap(col("start"), col("end"), col("strand"))
    val base = genomeTsv
      .withColumn("__s", s2).withColumn("__e", e2)
      .select(col("genome"), col("contig"), col("gene_id").as("feature_id"),
        col("aliases"),
        (col("__e") - col("__s")).cast("long").as("length"),
        col("__s").cast("long").as("start"), col("__e").cast("long").as("end"),
        col("strand"), col("type"), col("dna_sequence"),
        col("protein_translation").as("protein_sequence"),
        when(col("protein_translation").isNotNull &&
          col("protein_translation") =!= "",
          Hashes.proteinHash(col("protein_translation")))
          .as("protein_sequence_hash"))
    val prof = profile.select(col("feature_id"),
      col("pangenome_cluster"), col("is_core").cast("int").as("pangenome_is_core"))
    val wide = base
      .join(Relational.broadcastIfSmall(prof), Seq("feature_id"), "left")
      .join(ontologyPivot(annotations, maxTerms), Seq("feature_id"), "left")
    val ontologyCols = wide.columns.filter(_.startsWith("ontology_")).sorted
    val fixed = Seq("genome", "contig", "feature_id", "aliases", "length",
      "start", "end", "strand", "type", "dna_sequence", "protein_sequence",
      "protein_sequence_hash", "pangenome_cluster", "pangenome_is_core")
    wide.select((fixed ++ ontologyCols).map(col): _*)
  }

  /** `pangenome_feature` table (reference assembly
    * datalake_table.py:283-368, DDL :504-530): clade-member features
    * (coordinates come straight from the FASTA headers — no strand
    * swap, no length/aliases/dna columns) with the MMseqs cluster
    * lookup per (genome, feature) and dynamic ontology columns. */
  def pangenomeFeatureTable(features: DataFrame, clusters: DataFrame,
                            annotations: DataFrame, maxTerms: Int = 1000): DataFrame = {
    val base = features.select(col("genome"), col("contig"), col("feature_id"),
      col("start").cast("long").as("start"), col("end").cast("long").as("end"),
      col("strand"), col("type"), col("protein_sequence"),
      when(col("protein_sequence").isNotNull && col("protein_sequence") =!= "",
        Hashes.proteinHash(col("protein_sequence"))).as("protein_sequence_hash"))
    val clus = clusters.select(col("genome_id").as("genome"), col("feature_id"),
      col("cluster_id").as("cluster"), col("is_core").cast("int").as("is_core"))
    val wide = base
      .join(clus, Seq("genome", "feature_id"), "left")
      .join(ontologyPivot(annotations, maxTerms), Seq("feature_id"), "left")
    val ontologyCols = wide.columns.filter(_.startsWith("ontology_")).sorted
    val fixed = Seq("genome", "contig", "feature_id", "start", "end", "strand",
      "type", "protein_sequence", "protein_sequence_hash", "cluster", "is_core")
    wide.select((fixed ++ ontologyCols).map(col): _*)
  }

  /** `genome_phenotype` (reference datalake_table.py:532-575): genome
    * filter + the fixed 12-column DDL. */
  def genomePhenotypeTable(raw: DataFrame, allowed: DataFrame): DataFrame =
    conform(filterGenomes(raw, allowed), Seq(
      "genome_id" -> "string", "phenotype_id" -> "string",
      "phenotype_name" -> "string", "class" -> "string",
      "simulated_objective" -> "double", "observed_objective" -> "double",
      "gap_count" -> "int", "gapfilled_reactions" -> "string",
      "reaction_count" -> "int", "transports_added" -> "string",
      "closest_experimental_data" -> "string", "source" -> "string"))

  /** `gene_phenotype` (reference datalake_table.py:577-614). */
  def genePhenotypeTable(raw: DataFrame, allowed: DataFrame): DataFrame =
    conform(filterGenomes(raw, allowed), Seq(
      "genome_id" -> "string", "gene_id" -> "string",
      "phenotype_id" -> "string", "phenotype_name" -> "string",
      "association_sources" -> "string", "model_pred_reactions" -> "string",
      "model_pred_max_flux" -> "double", "fitness_match" -> "string",
      "fitness_max" -> "double", "fitness_min" -> "double",
      "fitness_avg" -> "double", "fitness_count" -> "int",
      "essentiality_fraction" -> "double"))

  /** `genome_gene_reaction_essentially_test` (reference
    * datalake_table.py:616-647). */
  def geneReactionTable(raw: DataFrame, allowed: DataFrame): DataFrame =
    conform(filterGenomes(raw, allowed), Seq(
      "genome_id" -> "string", "gene_id" -> "string", "reaction" -> "string",
      "rich_media_flux" -> "double", "rich_media_class" -> "string",
      "minimal_media_flux" -> "double", "minimal_media_class" -> "string"))

  /** `genome_reaction` (reference datalake_table.py:649-685). */
  def genomeReactionTable(raw: DataFrame, allowed: DataFrame): DataFrame =
    conform(filterGenomes(raw, allowed), Seq(
      "genome_id" -> "string", "reaction_id" -> "string", "genes" -> "string",
      "equation_names" -> "string", "equation_ids" -> "string",
      "directionality" -> "string", "upper_bound" -> "double",
      "lower_bound" -> "double", "gapfilling_status" -> "string",
      "rich_media_flux" -> "double", "rich_media_class" -> "string",
      "minimal_media_flux" -> "double", "minimal_media_class" -> "string"))

  /** `model_performance` (reference datalake_table.py:687-724). */
  def modelPerformanceTable(raw: DataFrame, allowed: DataFrame): DataFrame =
    conform(filterGenomes(raw, allowed), Seq(
      "genome_id" -> "string", "taxonomy" -> "string",
      "false_positives" -> "int", "false_negatives" -> "int",
      "true_positives" -> "int", "true_negatives" -> "int",
      "accuracy" -> "double", "positive_growth" -> "int",
      "negative_growth" -> "int", "avg_positive_growth_gaps" -> "double",
      "avg_negative_growth_gaps" -> "double",
      "closest_user_genomes" -> "string", "source" -> "string"))

  /** `media_composition` (reference datalake_table.py:726-748) — the
    * one output table with no genome filter. */
  def mediaCompositionTable(raw: DataFrame): DataFrame =
    conform(raw, Seq("media_id" -> "string", "compound_id" -> "string",
      "max_uptake" -> "double", "compound_name" -> "string"))

  /** `genome` table (reference datalake_table.py:84-171): GTDB metadata
    * (the reference scans the ar53 + bac120 TSVs as one frame) filtered
    * to the job's clade ∪ member accession set, alias projection, a
    * `kind` column (`clade_member` when the accession is a pangenome
    * member, `clade` otherwise), then the user's input genomes appended
    * as metadata-null rows with kind='user' (:146-168); fixed 8-column
    * DDL (:89-101).
    *
    * The accession sets are job-small by convention → size-gated
    * broadcast (semi join for the filter, left join for the member
    * flag), so the 580k-row GTDB metadata side never shuffles; a
    * pathological id set degrades to shuffle joins instead of OOMing. */
  def genomeTable(gtdbMetadata: DataFrame, cladeIds: DataFrame,
                  memberIds: DataFrame, inputGenomes: Seq[String]): DataFrame = {
    val spark = gtdbMetadata.sparkSession
    import spark.implicits._
    val member = memberIds.select(col(memberIds.columns.head).as("__mid")).distinct()
    val wanted = cladeIds.select(col(cladeIds.columns.head).as("__wid"))
      .unionByName(member.select(col("__mid").as("__wid"))).distinct()
    val matched = gtdbMetadata
      .join(Relational.broadcastIfSmall(wanted),
        col("accession") === col("__wid"), "left_semi")
      .join(Relational.broadcastIfSmall(member.withColumn("__is_member", lit(1))),
        col("accession") === col("__mid"), "left")
      .select(col("accession").as("genome"), col("gtdb_taxonomy"),
        col("ncbi_taxonomy"), col("ncbi_taxid"),
        col("checkm_completeness"), col("checkm_contamination"),
        col("genome_size").as("size"),
        when(col("__is_member") === 1, "clade_member").otherwise("clade").as("kind"))
    val userRows = inputGenomes.toDF("genome")
      .withColumn("gtdb_taxonomy", lit(null))
      .withColumn("ncbi_taxonomy", lit(null))
      .withColumn("ncbi_taxid", lit(null))
      .withColumn("checkm_completeness", lit(null))
      .withColumn("checkm_contamination", lit(null))
      .withColumn("size", lit(null))
      .withColumn("kind", lit("user"))
    conform(matched.unionByName(userRows), Seq(
      "genome" -> "string", "gtdb_taxonomy" -> "string",
      "ncbi_taxonomy" -> "string", "ncbi_taxid" -> "int",
      "checkm_completeness" -> "double", "checkm_contamination" -> "double",
      "size" -> "long", "kind" -> "string"))
  }

  /** `missing_functions` table (reference build_berdl_db.py:680-803):
    * the pan-vs-user gap report. A reaction gets a row when any source
    * flags it — user rows with a non-'none' gapfilling status (:690-710,
    * rich/minimal/core substring tests), the user model's gapfilled-
    * reaction categories (:712-730), the user's phenotype gapfill lists
    * (`;`-joined, :732-750), or presence in a pangenome member's model
    * but not the user's (:752-767). Names come from the reaction →
    * equation_names map (:769-778).
    *
    * The reference folds everything through one driver-side dict; here
    * each source emits (Reaction, flag…) rows and ONE groupBy(Reaction)
    * max-merges them — the union-aggregate form of a 5-way full outer
    * join, a single shuffle on the reaction id at any scale. The
    * reference's name map keeps the first file-order row per reaction
    * (pandas drop_duplicates), which is nondeterministic under a
    * parallel scan; this takes min(equation_names) — identical whenever
    * the name is functionally dependent on the reaction id, and
    * deterministic always. ModuleGapfill is declared in the DDL but no
    * reference code path sets it (:748 initializes 0) → constant 0. */
  def missingFunctionsTable(genomeReactions: DataFrame, modelGapfills: DataFrame,
                            genomePhenotypes: DataFrame,
                            userGenomeId: String): DataFrame = {
    val user = genomeReactions.filter(col("genome_id") === userGenomeId)
    val status = lower(col("gapfilling_status"))
    val fromStatus = user.filter(col("gapfilling_status") =!= "none")
      .select(col("reaction_id").as("Reaction"),
        status.contains("rich").cast("int").as("rich"),
        (status.contains("minimal") || status.contains("core"))
          .cast("int").as("minimal"),
        lit(0).as("pheno"), lit(0).as("pan"))
    val cat = lower(col("category"))
    val fromModel = modelGapfills
      .select(col("reaction_id").as("Reaction"),
        cat.contains("rich").cast("int").as("rich"),
        cat.contains("minimal").cast("int").as("minimal"),
        lit(0).as("pheno"), lit(0).as("pan"))
    val fromPheno = genomePhenotypes
      .filter(col("genome_id") === userGenomeId)
      .select(explode(split(coalesce(col("gapfilled_reactions"), lit("")), ";"))
        .as("__r"))
      .select(trim(col("__r")).as("Reaction"))
      .filter(col("Reaction") =!= "")
      .select(col("Reaction"), lit(0).as("rich"), lit(0).as("minimal"),
        lit(1).as("pheno"), lit(0).as("pan"))
    val fromPan = genomeReactions.filter(col("genome_id") =!= userGenomeId)
      .select(col("reaction_id")).distinct()
      .join(user.select(col("reaction_id")).distinct(),
        Seq("reaction_id"), "left_anti")
      .select(col("reaction_id").as("Reaction"), lit(0).as("rich"),
        lit(0).as("minimal"), lit(0).as("pheno"), lit(1).as("pan"))
    val flags = Seq(fromStatus, fromModel, fromPheno, fromPan)
      .reduce(_ unionByName _)
      .groupBy(col("Reaction"))
      .agg(max(col("rich")).as("RichGapfill"),
        max(col("minimal")).as("MinimalGapfill"),
        max(col("pheno")).as("PhenotypeGapfill"),
        max(col("pan")).as("Pangenome"))
    val names = genomeReactions.groupBy(col("reaction_id").as("Reaction"))
      .agg(min(col("equation_names")).as("RAST_function"))
    flags.join(names, Seq("Reaction"), "left")
      .select(col("Reaction"), col("RAST_function"),
        col("RichGapfill").cast("int").as("RichGapfill"),
        col("MinimalGapfill").cast("int").as("MinimalGapfill"),
        col("PhenotypeGapfill").cast("int").as("PhenotypeGapfill"),
        lit(0).as("ModuleGapfill"),
        col("Pangenome").cast("int").as("Pangenome"))
  }

  /** `growth_phenotype_summary` / `growth_phenotypes_detailed`
    * (reference build_berdl_db.py:1055-1081): dynamic-schema TSV
    * passthrough loads — the table carries whatever columns the
    * phenotype pipeline emitted, so the scan infers names from the
    * header and types from the data instead of conforming to a fixed
    * DDL (the S2 typed scan's schema-on-read counterpart). */
  def dynamicTsvTable(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("inferSchema", "true").csv(path)

  /** Render array-typed multi-value columns to the reference's
    * `'; '`-joined serving format at the very edge (SURVEY §1.2). */
  def renderMultiValue(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, concat_ws("; ", array_sort(col(c))))
    }

  /** Clade-partitioned Parquet sink: the physical layout that turns the
    * serving layer's clade-equality filters (SURVEY F1) into partition
    * pruning at 100 TB. */
  def writeCladePartitioned(df: DataFrame, path: String,
                            cladeCol: String = "clade_id"): Unit =
    df.write.mode("overwrite").partitionBy(cladeCol).parquet(path)
}
