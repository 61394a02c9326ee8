package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.TableBuild

/** Output-table assembly parity (reference: datalake_table.py:84-751):
  * one oracle-gated query per composed per-table builder, each
  * exercising its exact DDL column set/order, the `'; '`-join
  * rendering, 0/1 integer casts, strand swaps and protein hashing —
  * over deterministic fixtures derived from the TPC-H-ish gate tables
  * so DuckDB mirrors them exactly.
  *
  * Fixture shapes mirror the reference inputs: a user-genome TSV
  * (datalake_table.py:424-444), a per-genome pangenome profile
  * (:445-458), long-form (feature, term, value) annotations
  * (:305-316), and the phenotype/model TSVs the passthrough builders
  * filter and conform (:532-748).
  */
object TableQueries {

  val queries: Map[String, QueryFn] = Map(
    // user_feature: strand swap + length + protein hash + profile
    // lookup + dynamic ontology pivot, full 14-column DDL + terms.
    "tbl_user_feature" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val pk = col("p_partkey")
      def gene = concat(lit("gene_"), pk.cast("string"))
      val tsv = part.select(
        concat(lit("g"), (pk % 5).cast("string")).as("genome"),
        concat(lit("ctg"), (pk % 7).cast("string")).as("contig"),
        gene.as("gene_id"),
        col("p_brand").as("aliases"),
        (pk * 10).as("start"),
        (pk * 10 + col("p_size")).as("end"),
        when(pk % 2 === 0, "+").otherwise("-").as("strand"),
        when(pk % 3 === 0, "CDS").when(pk % 3 === 1, "tRNA")
          .otherwise("rRNA").as("type"),
        lit(null).cast("string").as("dna_sequence"),
        when(pk % 10 === 9, "")
          .otherwise(concat(upper(regexp_replace(col("p_name"), " ", "")), lit("*")))
          .as("protein_translation"))
      val profile = part.filter(pk % 3 === 0).select(
        gene.as("feature_id"),
        concat(lit("cl"), (pk % 11).cast("string")).as("pangenome_cluster"),
        (pk % 2).cast("int").as("is_core"))
      val ann = part.filter(pk % 4 === 0)
        .select(gene.as("feature_id"), lit("KEGG").as("term"),
          concat(lit("K"), (pk % 13).cast("string")).as("value"))
        .unionByName(part.filter(pk % 4 === 1)
          .select(gene.as("feature_id"), lit("GO").as("term"),
            concat(lit("GO:"), (pk % 17).cast("string")).as("value")))
        .unionByName(part.filter(pk % 4 === 2)
          .select(gene.as("feature_id"), lit("COG").as("term"),
            concat(lit("COG"), (pk % 9).cast("string")).as("value")))
        .unionByName(part.filter(pk % 8 === 0)
          .select(gene.as("feature_id"), lit("KEGG").as("term"),
            lit("K999").as("value")))
      TableBuild.userFeatureTable(tsv, profile, ann)
    }),

    // pangenome_feature: FASTA-header coordinates (no swap), cluster
    // lookup per (genome, feature), 11 fixed columns + terms.
    "tbl_pangenome_feature" -> ((s, d) => {
      val orders = tbl(s, d, "orders")
      val ok = col("o_orderkey")
      def feat = concat(lit("f"), ok.cast("string"))
      val features = orders.select(
        concat(lit("g"), (col("o_custkey") % 10).cast("string")).as("genome"),
        concat(lit("ctg"), (ok % 5).cast("string")).as("contig"),
        feat.as("feature_id"),
        (ok % 100000).as("start"),
        (ok % 100000 + 500).as("end"),
        when(ok % 2 === 0, "+").otherwise("-").as("strand"),
        lit("CDS").as("type"),
        when(ok % 9 === 8, lit(null).cast("string"))
          .otherwise(concat(lit("MSEQ"), (ok % 50).cast("string")))
          .as("protein_sequence"))
      val clusters = orders.filter(ok % 2 === 0).select(
        concat(lit("g"), (col("o_custkey") % 10).cast("string")).as("genome_id"),
        feat.as("feature_id"),
        concat(lit("cl"), (ok % 20).cast("string")).as("cluster_id"),
        (ok % 3 === 0).cast("int").as("is_core"))
      val ann = orders.filter(ok % 5 === 0)
        .select(feat.as("feature_id"), lit("KEGG").as("term"),
          concat(lit("K"), (ok % 31).cast("string")).as("value"))
        .unionByName(orders.filter(ok % 5 === 1)
          .select(feat.as("feature_id"), lit("PFAM").as("term"),
            concat(lit("PF"), (ok % 23).cast("string")).as("value")))
      TableBuild.pangenomeFeatureTable(features, clusters, ann)
    }),

    // genome_phenotype: genome-set semi filter + fixed 12-column DDL.
    "tbl_genome_phenotype" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val eid = col("event_id")
      val raw = ev.select(
        concat(lit("g"), (col("user_id") % 20).cast("string")).as("genome_id"),
        concat(lit("phen"), (eid % 50).cast("string")).as("phenotype_id"),
        concat(lit("P-"), (eid % 50).cast("string")).as("phenotype_name"),
        when(col("event_type") === "purchase", "P")
          .when(col("event_type") === "error", "N").otherwise("A").as("class"),
        round4(col("value") / 100).as("simulated_objective"),
        when(eid % 2 === 0, 1.0).otherwise(0.0).as("observed_objective"),
        (eid % 5).cast("int").as("gap_count"),
        concat(lit("rxn"), (eid % 7).cast("string"), lit(";rxn"),
          (eid % 3).cast("string")).as("gapfilled_reactions"),
        (eid % 30).cast("int").as("reaction_count"),
        when(eid % 4 === 0, "cpd00971_c0").otherwise("").as("transports_added"),
        concat(lit("g"), (col("user_id") % 3).cast("string"))
          .as("closest_experimental_data"),
        lit("pangenome").as("source"))
      val allowed = ev.filter(col("user_id") % 20 < 12)
        .select(concat(lit("g"), (col("user_id") % 20).cast("string")).as("gid"))
      TableBuild.genomePhenotypeTable(raw, allowed)
    }),

    // gene_phenotype: 13-column DDL with fitness stats passthrough.
    "tbl_gene_phenotype" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val raw = li.select(
        concat(lit("g"), (col("l_orderkey") % 25).cast("string")).as("genome_id"),
        concat(lit("gene"), col("l_partkey").cast("string")).as("gene_id"),
        concat(lit("phen"), (col("l_suppkey") % 30).cast("string")).as("phenotype_id"),
        concat(lit("P-"), (col("l_suppkey") % 30).cast("string")).as("phenotype_name"),
        when(col("l_linenumber") % 2 === 0, "model_prediction")
          .otherwise("fitness").as("association_sources"),
        concat(lit("rxn"), (col("l_partkey") % 40).cast("string"))
          .as("model_pred_reactions"),
        round2(col("l_extendedprice") / 1000).as("model_pred_max_flux"),
        when(col("l_linenumber") % 3 === 0, "no_fitness_ortholog")
          .otherwise("ortholog").as("fitness_match"),
        round2(col("l_quantity") / 10).as("fitness_max"),
        round2(col("l_quantity") / 100).as("fitness_min"),
        round2(col("l_quantity") / 50).as("fitness_avg"),
        col("l_linenumber").cast("int").as("fitness_count"),
        round4(col("l_discount")).as("essentiality_fraction"))
      val allowed = li.filter(col("l_orderkey") % 25 < 20)
        .select(concat(lit("g"), (col("l_orderkey") % 25).cast("string")).as("gid"))
      TableBuild.genePhenotypeTable(raw, allowed)
    }),

    // genome_gene_reaction_essentially_test: 7-column DDL.
    "tbl_gene_reaction" -> ((s, d) => {
      val sup = tbl(s, d, "supplier")
      val sk = col("s_suppkey")
      val raw = sup.select(
        concat(lit("g"), (sk % 4).cast("string")).as("genome_id"),
        concat(lit("gene"), sk.cast("string")).as("gene_id"),
        concat(lit("rxn"), (sk % 9).cast("string"), lit(";rxn"),
          (sk % 5).cast("string")).as("reaction"),
        round2(col("s_acctbal") / 10).as("rich_media_flux"),
        when(sk % 3 === 0, "blocked").when(sk % 3 === 1, "variable")
          .otherwise("essential").as("rich_media_class"),
        round2(col("s_acctbal") / 20).as("minimal_media_flux"),
        when((sk + 1) % 3 === 0, "blocked").when((sk + 1) % 3 === 1, "variable")
          .otherwise("essential").as("minimal_media_class"))
      val allowed = sup.filter(sk % 4 < 3)
        .select(concat(lit("g"), (sk % 4).cast("string")).as("gid"))
      TableBuild.geneReactionTable(raw, allowed)
    }),

    // genome_reaction: 13-column DDL with bounds/flux passthrough.
    "tbl_genome_reaction" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val pk = col("p_partkey")
      val raw = part.select(
        concat(lit("g"), (pk % 8).cast("string")).as("genome_id"),
        concat(lit("rxn"), pk.cast("string")).as("reaction_id"),
        concat(lit("gene"), (pk % 100).cast("string"), lit(";gene"),
          (pk % 50).cast("string")).as("genes"),
        col("p_name").as("equation_names"),
        concat(lit("cpd"), (pk % 60).cast("string")).as("equation_ids"),
        when(pk % 3 === 0, "=>").when(pk % 3 === 1, "<=")
          .otherwise("<=>").as("directionality"),
        when(pk % 3 === 1, 0.0).otherwise(1000.0).as("upper_bound"),
        when(pk % 3 === 0, 0.0).otherwise(-1000.0).as("lower_bound"),
        when(pk % 4 === 0, "gapfilled").otherwise("annotated")
          .as("gapfilling_status"),
        round2(col("p_retailprice") / 100).as("rich_media_flux"),
        when(pk % 3 === 0, "blocked").when(pk % 3 === 1, "variable")
          .otherwise("essential").as("rich_media_class"),
        round2(col("p_retailprice") / 200).as("minimal_media_flux"),
        when((pk + 1) % 3 === 0, "blocked").when((pk + 1) % 3 === 1, "variable")
          .otherwise("essential").as("minimal_media_class"))
      val allowed = part.filter(pk % 8 < 6)
        .select(concat(lit("g"), (pk % 8).cast("string")).as("gid"))
      TableBuild.genomeReactionTable(raw, allowed)
    }),

    // model_performance: confusion counts + derived accuracy, 13 cols.
    "tbl_model_performance" -> ((s, d) => {
      val cust = tbl(s, d, "customer")
      val ck = col("c_custkey")
      val tp = (ck % 20).cast("int"); val tn = (ck % 10).cast("int")
      val fp = (ck % 7).cast("int"); val fn = (ck % 5).cast("int")
      val raw = cust.select(
        concat(lit("g"), ck.cast("string")).as("genome_id"),
        concat(lit("d__Bacteria;p__"), col("c_nationkey").cast("string"))
          .as("taxonomy"),
        fp.as("false_positives"), fn.as("false_negatives"),
        tp.as("true_positives"), tn.as("true_negatives"),
        round4((tp + tn).cast("double") / (tp + tn + fp + fn + 1).cast("double"))
          .as("accuracy"),
        (ck % 4).cast("int").as("positive_growth"),
        (ck % 3).cast("int").as("negative_growth"),
        round2(col("c_acctbal") / 100).as("avg_positive_growth_gaps"),
        round2(col("c_acctbal") / 200).as("avg_negative_growth_gaps"),
        concat(lit("u"), (ck % 5).cast("string"), lit(";u"),
          (ck % 11).cast("string")).as("closest_user_genomes"),
        when(ck % 3 === 0, "pangenome").when(ck % 3 === 1, "user")
          .otherwise("experiment").as("source"))
      val allowed = cust.filter(ck % 2 === 0)
        .select(concat(lit("g"), ck.cast("string")).as("gid"))
      TableBuild.modelPerformanceTable(raw, allowed)
    }),

    // media_composition: the no-filter 4-column DDL.
    "tbl_media_composition" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val pk = col("p_partkey")
      val raw = part.select(
        concat(lit("m"), (pk % 10).cast("string")).as("media_id"),
        concat(lit("cpd"), (pk % 200).cast("string")).as("compound_id"),
        round2(col("p_retailprice") / 50).as("max_uptake"),
        col("p_name").as("compound_name"))
      TableBuild.mediaCompositionTable(raw)
    }),

    // genome: GTDB-metadata scan + clade∪member id filter + member-flag
    // kind column + metadata-null user rows, 8-column DDL.
    "tbl_genome" -> ((s, d) => {
      val cust = tbl(s, d, "customer")
      val ck = col("c_custkey")
      def acc = concat(lit("acc"), ck.cast("string"))
      val meta = cust.select(
        acc.as("accession"),
        concat(lit("d__Bacteria;p__"), (ck % 40).cast("string")).as("gtdb_taxonomy"),
        concat(lit("cellular organisms;clade"), (ck % 40).cast("string"))
          .as("ncbi_taxonomy"),
        (ck % 997).cast("int").as("ncbi_taxid"),
        round2(col("c_acctbal") / 100).as("checkm_completeness"),
        round2(col("c_acctbal") / 1000).as("checkm_contamination"),
        (ck * 1000 + ck % 7).as("genome_size"))
      val cladeIds = cust.filter(ck % 3 === 0).select(acc.as("id"))
      val memberIds = cust.filter(ck % 5 === 0).select(acc.as("id"))
      TableBuild.genomeTable(meta, cladeIds, memberIds, Seq("user_a", "user_b"))
    }),

    // missing_functions: 4-source flag union → one groupBy max-merge +
    // name lookup (the pan-vs-user anti-join report).
    "tbl_missing_functions" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val pk = col("p_partkey")
      val rxn = part.select(
        concat(lit("g"), (pk % 8).cast("string")).as("genome_id"),
        concat(lit("rxn"), (pk % 50).cast("string")).as("reaction_id"),
        concat(lit("eq"), (pk % 50).cast("string")).as("equation_names"),
        when(pk % 5 === 1, "rich media gapfill")
          .when(pk % 5 === 2, "minimal media gapfill")
          .when(pk % 5 === 3, "core gapfill")
          .otherwise("none").as("gapfilling_status"))
      val sup = tbl(s, d, "supplier")
      val sk = col("s_suppkey")
      val modelGf = sup.select(
        when(sk % 3 === 0, "rich_media").when(sk % 3 === 1, "minimal_media")
          .otherwise("other").as("category"),
        concat(lit("rxn"), (sk % 60).cast("string")).as("reaction_id"))
      val ord = tbl(s, d, "orders")
      val ok = col("o_orderkey")
      val pheno = ord.select(
        concat(lit("g"), (col("o_custkey") % 4).cast("string")).as("genome_id"),
        when(ok % 7 === 0, "")
          .otherwise(concat(lit("rxn"), (ok % 45).cast("string"),
            lit("; rxn"), (ok % 33).cast("string"))).as("gapfilled_reactions"))
      TableBuild.missingFunctionsTable(rxn, modelGf, pheno, "g0")
    }),

    // growth_phenotype_summary: dynamic-schema TSV passthrough of the
    // model-performance file (no genome filter, no fixed DDL).
    "tbl_growth_summary" -> ((s, d) => {
      val cust = tbl(s, d, "customer")
      val ck = col("c_custkey")
      val raw = cust.select(
        concat(lit("g"), ck.cast("string")).as("genome_id"),
        concat(lit("d__Bacteria;p__"), col("c_nationkey").cast("string"))
          .as("taxonomy"),
        (ck % 7).cast("int").as("false_positives"),
        (ck % 5).cast("int").as("false_negatives"),
        (ck % 20).cast("int").as("true_positives"),
        (ck % 10).cast("int").as("true_negatives"),
        round2(col("c_acctbal") / 100).as("avg_gaps"),
        when(ck % 3 === 0, "pangenome").when(ck % 3 === 1, "user")
          .otherwise("experiment").as("source"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_growth_summary_${math.abs(d.hashCode)}"
      raw.coalesce(1).write.mode("overwrite")
        .option("sep", "\t").option("header", "true").csv(path)
      TableBuild.dynamicTsvTable(s, path)
    }),

    // growth_phenotypes_detailed: dynamic-schema TSV passthrough of the
    // per-phenotype file.
    "tbl_growth_detailed" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val eid = col("event_id")
      val raw = ev.select(
        concat(lit("g"), (col("user_id") % 20).cast("string")).as("genome_id"),
        concat(lit("phen"), (eid % 50).cast("string")).as("phenotype_id"),
        when(col("event_type") === "purchase", "P")
          .when(col("event_type") === "error", "N").otherwise("A").as("class"),
        round4(col("value") / 100).as("simulated_objective"),
        when(eid % 2 === 0, 1.0).otherwise(0.0).as("observed_objective"),
        (eid % 5).cast("int").as("gap_count"),
        concat(lit("rxn"), (eid % 7).cast("string")).as("gapfilled_reactions"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_growth_detailed_${math.abs(d.hashCode)}"
      raw.coalesce(1).write.mode("overwrite")
        .option("sep", "\t").option("header", "true").csv(path)
      TableBuild.dynamicTsvTable(s, path)
    }),

    // ani: the 4-source merge (datalake_table.py:216-282). The three
    // user-genome sources (kepangenomes/fitness/phenotypes JSONs) carry
    // dict-OVERWRITE semantics — last loaded wins, so effective
    // priority is phenotypes > fitness > kepangenomes — and the
    // pangenome ani_members source alone fills only absent pairs.
    // Each source models its reference shape: the user sources are
    // filtered to the input-genome set and `user_`-prefixed
    // (datalake_table.py:220-244); members carries raw pangenome ids
    // (already user_-prefixed for user members, :245-257). Rendered in
    // the `ani` DDL order genome1..af2 with REAL values rounded to 4
    // places (build_ani_table, :259-282).
    "tbl_ani" -> ((s, d) => {
      val cust = tbl(s, d, "customer")
      val ck = col("c_custkey")
      def src(mod: Int, off: Int, userSide: Boolean) = {
        val base = cust.filter(ck % mod === 0)
        val inSet = if (userSide) base.filter(ck % 12 < 9) else base
        inSet.select(
            concat(lit("user_g"), (ck % 12).cast("string")).as("genome1_id"),
            concat(lit("gB"), (ck % 7).cast("string")).as("genome2_id"),
            col("c_acctbal"), ck.as("__ck"))
          .groupBy("genome1_id", "genome2_id")
          .agg(
            round4((min(col("c_acctbal")) + off) / 1000).as("ani"),
            round4((max(col("c_acctbal")) + off) / 2000).as("af1"),
            round4((min(col("__ck")) % 1000).cast("double") / 1000 + off).as("af2"))
      }
      TableBuild.aniMerge(Seq(
        src(5, 300, userSide = true),  // phenotypes (highest: last dict write)
        src(4, 200, userSide = true),  // fitness
        src(3, 100, userSide = true),  // kepangenomes
        src(2, 0, userSide = false)))  // members (fills absent pairs only)
        .select(col("genome1_id").as("genome1"), col("genome2_id").as("genome2"),
          col("ani"), col("af1"), col("af2"))
    }))

  val oracles: Map[String, String] = Map(
    "tbl_ani" ->
      """WITH src AS (
           SELECT 1 AS prio,
                  'user_g' || (c_custkey % 12) AS genome1,
                  'gB' || (c_custkey % 7) AS genome2,
                  floor(((min(c_acctbal) + 300) / 1000) * 10000 + 0.5) / 10000 AS ani,
                  floor(((max(c_acctbal) + 300) / 2000) * 10000 + 0.5) / 10000 AS af1,
                  floor((CAST(min(c_custkey) % 1000 AS DOUBLE) / 1000 + 300) * 10000 + 0.5) / 10000 AS af2
           FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 12 < 9 GROUP BY 2, 3
           UNION ALL
           SELECT 2,
                  'user_g' || (c_custkey % 12), 'gB' || (c_custkey % 7),
                  floor(((min(c_acctbal) + 200) / 1000) * 10000 + 0.5) / 10000,
                  floor(((max(c_acctbal) + 200) / 2000) * 10000 + 0.5) / 10000,
                  floor((CAST(min(c_custkey) % 1000 AS DOUBLE) / 1000 + 200) * 10000 + 0.5) / 10000
           FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 12 < 9 GROUP BY 2, 3
           UNION ALL
           SELECT 3,
                  'user_g' || (c_custkey % 12), 'gB' || (c_custkey % 7),
                  floor(((min(c_acctbal) + 100) / 1000) * 10000 + 0.5) / 10000,
                  floor(((max(c_acctbal) + 100) / 2000) * 10000 + 0.5) / 10000,
                  floor((CAST(min(c_custkey) % 1000 AS DOUBLE) / 1000 + 100) * 10000 + 0.5) / 10000
           FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 12 < 9 GROUP BY 2, 3
           UNION ALL
           SELECT 4,
                  'user_g' || (c_custkey % 12), 'gB' || (c_custkey % 7),
                  floor(((min(c_acctbal) + 0) / 1000) * 10000 + 0.5) / 10000,
                  floor(((max(c_acctbal) + 0) / 2000) * 10000 + 0.5) / 10000,
                  floor((CAST(min(c_custkey) % 1000 AS DOUBLE) / 1000 + 0) * 10000 + 0.5) / 10000
           FROM customer WHERE c_custkey % 2 = 0 GROUP BY 2, 3),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY genome1, genome2 ORDER BY prio, ani) AS rn
           FROM src)
         SELECT genome1, genome2, ani, af1, af2 FROM ranked WHERE rn = 1""",
    "tbl_user_feature" ->
      """WITH tsv AS (
           SELECT 'g' || (p_partkey % 5) AS genome,
                  'ctg' || (p_partkey % 7) AS contig,
                  'gene_' || p_partkey AS feature_id,
                  p_brand AS aliases,
                  p_partkey * 10 AS df_start,
                  p_partkey * 10 + p_size AS df_end,
                  CASE WHEN p_partkey % 2 = 0 THEN '+' ELSE '-' END AS strand,
                  CASE WHEN p_partkey % 3 = 0 THEN 'CDS'
                       WHEN p_partkey % 3 = 1 THEN 'tRNA' ELSE 'rRNA' END AS type,
                  CAST(NULL AS VARCHAR) AS dna_sequence,
                  CASE WHEN p_partkey % 10 = 9 THEN ''
                       ELSE upper(replace(p_name, ' ', '')) || '*' END AS protein_translation
           FROM part),
         coords AS (
           SELECT *, CASE WHEN strand = '-' THEN df_end ELSE df_start END AS st,
                     CASE WHEN strand = '-' THEN df_start ELSE df_end END AS en
           FROM tsv),
         prof AS (
           SELECT 'gene_' || p_partkey AS feature_id,
                  'cl' || (p_partkey % 11) AS pangenome_cluster,
                  CAST(p_partkey % 2 AS INTEGER) AS pangenome_is_core
           FROM part WHERE p_partkey % 3 = 0),
         ann AS (
           SELECT 'gene_' || p_partkey AS feature_id, 'KEGG' AS term,
                  'K' || (p_partkey % 13) AS value FROM part WHERE p_partkey % 4 = 0
           UNION ALL SELECT 'gene_' || p_partkey, 'GO', 'GO:' || (p_partkey % 17)
             FROM part WHERE p_partkey % 4 = 1
           UNION ALL SELECT 'gene_' || p_partkey, 'COG', 'COG' || (p_partkey % 9)
             FROM part WHERE p_partkey % 4 = 2
           UNION ALL SELECT 'gene_' || p_partkey, 'KEGG', 'K999'
             FROM part WHERE p_partkey % 8 = 0),
         piv AS (
           SELECT feature_id,
             array_to_string(list_sort(list(DISTINCT value) FILTER (WHERE term = 'COG')), '; ') AS ontology_COG,
             array_to_string(list_sort(list(DISTINCT value) FILTER (WHERE term = 'GO')), '; ') AS ontology_GO,
             array_to_string(list_sort(list(DISTINCT value) FILTER (WHERE term = 'KEGG')), '; ') AS ontology_KEGG
           FROM ann GROUP BY feature_id)
         SELECT c.genome, c.contig, c.feature_id, c.aliases,
           CAST(c.en - c.st AS BIGINT) AS length,
           CAST(c.st AS BIGINT) AS start, CAST(c.en AS BIGINT) AS "end",
           c.strand, c.type, c.dna_sequence,
           c.protein_translation AS protein_sequence,
           CASE WHEN c.protein_translation IS NOT NULL AND c.protein_translation <> ''
                THEN sha256(upper(regexp_replace(c.protein_translation, '\*$', '')))
           END AS protein_sequence_hash,
           p.pangenome_cluster, p.pangenome_is_core,
           v.ontology_COG, v.ontology_GO, v.ontology_KEGG
         FROM coords c
         LEFT JOIN prof p USING (feature_id)
         LEFT JOIN piv v USING (feature_id)""",
    "tbl_pangenome_feature" ->
      """WITH features AS (
           SELECT 'g' || (o_custkey % 10) AS genome,
                  'ctg' || (o_orderkey % 5) AS contig,
                  'f' || o_orderkey AS feature_id,
                  o_orderkey % 100000 AS st,
                  o_orderkey % 100000 + 500 AS en,
                  CASE WHEN o_orderkey % 2 = 0 THEN '+' ELSE '-' END AS strand,
                  'CDS' AS type,
                  CASE WHEN o_orderkey % 9 = 8 THEN CAST(NULL AS VARCHAR)
                       ELSE 'MSEQ' || (o_orderkey % 50) END AS protein_sequence
           FROM orders),
         clus AS (
           SELECT 'g' || (o_custkey % 10) AS genome,
                  'f' || o_orderkey AS feature_id,
                  'cl' || (o_orderkey % 20) AS cluster,
                  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_core
           FROM orders WHERE o_orderkey % 2 = 0),
         ann AS (
           SELECT 'f' || o_orderkey AS feature_id, 'KEGG' AS term,
                  'K' || (o_orderkey % 31) AS value FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL SELECT 'f' || o_orderkey, 'PFAM', 'PF' || (o_orderkey % 23)
             FROM orders WHERE o_orderkey % 5 = 1),
         piv AS (
           SELECT feature_id,
             array_to_string(list_sort(list(DISTINCT value) FILTER (WHERE term = 'KEGG')), '; ') AS ontology_KEGG,
             array_to_string(list_sort(list(DISTINCT value) FILTER (WHERE term = 'PFAM')), '; ') AS ontology_PFAM
           FROM ann GROUP BY feature_id)
         SELECT f.genome, f.contig, f.feature_id,
           CAST(f.st AS BIGINT) AS start, CAST(f.en AS BIGINT) AS "end",
           f.strand, f.type, f.protein_sequence,
           CASE WHEN f.protein_sequence IS NOT NULL AND f.protein_sequence <> ''
                THEN sha256(upper(regexp_replace(f.protein_sequence, '\*$', '')))
           END AS protein_sequence_hash,
           c.cluster, c.is_core,
           v.ontology_KEGG, v.ontology_PFAM
         FROM features f
         LEFT JOIN clus c USING (genome, feature_id)
         LEFT JOIN piv v USING (feature_id)""",
    "tbl_genome_phenotype" ->
      """SELECT 'g' || (user_id % 20) AS genome_id,
           'phen' || (event_id % 50) AS phenotype_id,
           'P-' || (event_id % 50) AS phenotype_name,
           CASE WHEN event_type = 'purchase' THEN 'P'
                WHEN event_type = 'error' THEN 'N' ELSE 'A' END AS "class",
           floor((value / 100) * 10000 + 0.5) / 10000 AS simulated_objective,
           CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE 0.0 END::DOUBLE AS observed_objective,
           CAST(event_id % 5 AS INTEGER) AS gap_count,
           'rxn' || (event_id % 7) || ';rxn' || (event_id % 3) AS gapfilled_reactions,
           CAST(event_id % 30 AS INTEGER) AS reaction_count,
           CASE WHEN event_id % 4 = 0 THEN 'cpd00971_c0' ELSE '' END AS transports_added,
           'g' || (user_id % 3) AS closest_experimental_data,
           'pangenome' AS source
         FROM events WHERE user_id % 20 < 12""",
    "tbl_gene_phenotype" ->
      """SELECT 'g' || (l_orderkey % 25) AS genome_id,
           'gene' || l_partkey AS gene_id,
           'phen' || (l_suppkey % 30) AS phenotype_id,
           'P-' || (l_suppkey % 30) AS phenotype_name,
           CASE WHEN l_linenumber % 2 = 0 THEN 'model_prediction'
                ELSE 'fitness' END AS association_sources,
           'rxn' || (l_partkey % 40) AS model_pred_reactions,
           floor((l_extendedprice / 1000) * 100 + 0.5) / 100 AS model_pred_max_flux,
           CASE WHEN l_linenumber % 3 = 0 THEN 'no_fitness_ortholog'
                ELSE 'ortholog' END AS fitness_match,
           floor((l_quantity / 10) * 100 + 0.5) / 100 AS fitness_max,
           floor((l_quantity / 100) * 100 + 0.5) / 100 AS fitness_min,
           floor((l_quantity / 50) * 100 + 0.5) / 100 AS fitness_avg,
           CAST(l_linenumber AS INTEGER) AS fitness_count,
           floor((l_discount) * 10000 + 0.5) / 10000 AS essentiality_fraction
         FROM lineitem WHERE l_orderkey % 25 < 20""",
    "tbl_gene_reaction" ->
      """SELECT 'g' || (s_suppkey % 4) AS genome_id,
           'gene' || s_suppkey AS gene_id,
           'rxn' || (s_suppkey % 9) || ';rxn' || (s_suppkey % 5) AS reaction,
           floor((s_acctbal / 10) * 100 + 0.5) / 100 AS rich_media_flux,
           CASE WHEN s_suppkey % 3 = 0 THEN 'blocked'
                WHEN s_suppkey % 3 = 1 THEN 'variable'
                ELSE 'essential' END AS rich_media_class,
           floor((s_acctbal / 20) * 100 + 0.5) / 100 AS minimal_media_flux,
           CASE WHEN (s_suppkey + 1) % 3 = 0 THEN 'blocked'
                WHEN (s_suppkey + 1) % 3 = 1 THEN 'variable'
                ELSE 'essential' END AS minimal_media_class
         FROM supplier WHERE s_suppkey % 4 < 3""",
    "tbl_genome_reaction" ->
      """SELECT 'g' || (p_partkey % 8) AS genome_id,
           'rxn' || p_partkey AS reaction_id,
           'gene' || (p_partkey % 100) || ';gene' || (p_partkey % 50) AS genes,
           p_name AS equation_names,
           'cpd' || (p_partkey % 60) AS equation_ids,
           CASE WHEN p_partkey % 3 = 0 THEN '=>'
                WHEN p_partkey % 3 = 1 THEN '<=' ELSE '<=>' END AS directionality,
           CASE WHEN p_partkey % 3 = 1 THEN 0.0 ELSE 1000.0 END::DOUBLE AS upper_bound,
           CASE WHEN p_partkey % 3 = 0 THEN 0.0 ELSE -1000.0 END::DOUBLE AS lower_bound,
           CASE WHEN p_partkey % 4 = 0 THEN 'gapfilled' ELSE 'annotated' END AS gapfilling_status,
           floor((p_retailprice / 100) * 100 + 0.5) / 100 AS rich_media_flux,
           CASE WHEN p_partkey % 3 = 0 THEN 'blocked'
                WHEN p_partkey % 3 = 1 THEN 'variable'
                ELSE 'essential' END AS rich_media_class,
           floor((p_retailprice / 200) * 100 + 0.5) / 100 AS minimal_media_flux,
           CASE WHEN (p_partkey + 1) % 3 = 0 THEN 'blocked'
                WHEN (p_partkey + 1) % 3 = 1 THEN 'variable'
                ELSE 'essential' END AS minimal_media_class
         FROM part WHERE p_partkey % 8 < 6""",
    "tbl_model_performance" ->
      """SELECT 'g' || c_custkey AS genome_id,
           'd__Bacteria;p__' || c_nationkey AS taxonomy,
           CAST(c_custkey % 7 AS INTEGER) AS false_positives,
           CAST(c_custkey % 5 AS INTEGER) AS false_negatives,
           CAST(c_custkey % 20 AS INTEGER) AS true_positives,
           CAST(c_custkey % 10 AS INTEGER) AS true_negatives,
           floor((CAST(c_custkey % 20 + c_custkey % 10 AS DOUBLE) /
                  CAST(c_custkey % 20 + c_custkey % 10 + c_custkey % 7 + c_custkey % 5 + 1 AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS accuracy,
           CAST(c_custkey % 4 AS INTEGER) AS positive_growth,
           CAST(c_custkey % 3 AS INTEGER) AS negative_growth,
           floor((c_acctbal / 100) * 100 + 0.5) / 100 AS avg_positive_growth_gaps,
           floor((c_acctbal / 200) * 100 + 0.5) / 100 AS avg_negative_growth_gaps,
           'u' || (c_custkey % 5) || ';u' || (c_custkey % 11) AS closest_user_genomes,
           CASE WHEN c_custkey % 3 = 0 THEN 'pangenome'
                WHEN c_custkey % 3 = 1 THEN 'user' ELSE 'experiment' END AS source
         FROM customer WHERE c_custkey % 2 = 0""",
    "tbl_media_composition" ->
      """SELECT 'm' || (p_partkey % 10) AS media_id,
           'cpd' || (p_partkey % 200) AS compound_id,
           floor((p_retailprice / 50) * 100 + 0.5) / 100 AS max_uptake,
           p_name AS compound_name
         FROM part""",
    "tbl_genome" ->
      """WITH meta AS (
           SELECT 'acc' || c_custkey AS accession,
                  'd__Bacteria;p__' || (c_custkey % 40) AS gtdb_taxonomy,
                  'cellular organisms;clade' || (c_custkey % 40) AS ncbi_taxonomy,
                  CAST(c_custkey % 997 AS INTEGER) AS ncbi_taxid,
                  floor((c_acctbal / 100) * 100 + 0.5) / 100 AS checkm_completeness,
                  floor((c_acctbal / 1000) * 100 + 0.5) / 100 AS checkm_contamination,
                  c_custkey * 1000 + c_custkey % 7 AS genome_size
           FROM customer),
         member AS (SELECT 'acc' || c_custkey AS id FROM customer WHERE c_custkey % 5 = 0),
         wanted AS (SELECT 'acc' || c_custkey AS id FROM customer WHERE c_custkey % 3 = 0
                    UNION SELECT id FROM member)
         SELECT m.accession AS genome, m.gtdb_taxonomy, m.ncbi_taxonomy, m.ncbi_taxid,
           m.checkm_completeness, m.checkm_contamination,
           CAST(m.genome_size AS BIGINT) AS "size",
           CASE WHEN mem.id IS NOT NULL THEN 'clade_member' ELSE 'clade' END AS kind
         FROM meta m
         JOIN wanted w ON m.accession = w.id
         LEFT JOIN member mem ON m.accession = mem.id
         UNION ALL
         SELECT g, NULL, NULL, NULL, NULL, NULL, NULL, 'user'
         FROM (VALUES ('user_a'), ('user_b')) t(g)""",
    "tbl_missing_functions" ->
      """WITH rxn AS (
           SELECT 'g' || (p_partkey % 8) AS genome_id,
                  'rxn' || (p_partkey % 50) AS reaction_id,
                  'eq' || (p_partkey % 50) AS equation_names,
                  CASE WHEN p_partkey % 5 = 1 THEN 'rich media gapfill'
                       WHEN p_partkey % 5 = 2 THEN 'minimal media gapfill'
                       WHEN p_partkey % 5 = 3 THEN 'core gapfill'
                       ELSE 'none' END AS gapfilling_status
           FROM part),
         model_gf AS (
           SELECT CASE WHEN s_suppkey % 3 = 0 THEN 'rich_media'
                       WHEN s_suppkey % 3 = 1 THEN 'minimal_media'
                       ELSE 'other' END AS category,
                  'rxn' || (s_suppkey % 60) AS reaction_id
           FROM supplier),
         pheno AS (
           SELECT 'g' || (o_custkey % 4) AS genome_id,
                  CASE WHEN o_orderkey % 7 = 0 THEN ''
                       ELSE 'rxn' || (o_orderkey % 45) || '; rxn' || (o_orderkey % 33)
                  END AS gapfilled_reactions
           FROM orders),
         user_rxn AS (SELECT * FROM rxn WHERE genome_id = 'g0'),
         flags AS (
           SELECT reaction_id AS r,
             CASE WHEN lower(gapfilling_status) LIKE '%rich%' THEN 1 ELSE 0 END AS rich,
             CASE WHEN lower(gapfilling_status) LIKE '%minimal%'
                    OR lower(gapfilling_status) LIKE '%core%' THEN 1 ELSE 0 END AS mini,
             0 AS phen, 0 AS pan
           FROM user_rxn WHERE gapfilling_status <> 'none'
           UNION ALL
           SELECT reaction_id,
             CASE WHEN lower(category) LIKE '%rich%' THEN 1 ELSE 0 END,
             CASE WHEN lower(category) LIKE '%minimal%' THEN 1 ELSE 0 END, 0, 0
           FROM model_gf
           UNION ALL
           SELECT trim(x), 0, 0, 1, 0 FROM (
             SELECT unnest(string_split(gapfilled_reactions, ';')) AS x
             FROM pheno WHERE genome_id = 'g0') WHERE trim(x) <> ''
           UNION ALL
           SELECT reaction_id, 0, 0, 0, 1 FROM (
             SELECT DISTINCT reaction_id FROM rxn WHERE genome_id <> 'g0'
             EXCEPT SELECT DISTINCT reaction_id FROM user_rxn)),
         names AS (SELECT reaction_id, min(equation_names) AS nm FROM rxn GROUP BY 1),
         agg AS (SELECT r, max(rich) AS rich, max(mini) AS mini,
                        max(phen) AS phen, max(pan) AS pan
                 FROM flags GROUP BY r)
         SELECT a.r AS "Reaction", n.nm AS "RAST_function",
           CAST(a.rich AS INTEGER) AS "RichGapfill",
           CAST(a.mini AS INTEGER) AS "MinimalGapfill",
           CAST(a.phen AS INTEGER) AS "PhenotypeGapfill",
           0 AS "ModuleGapfill",
           CAST(a.pan AS INTEGER) AS "Pangenome"
         FROM agg a LEFT JOIN names n ON a.r = n.reaction_id""",
    "tbl_growth_summary" ->
      """SELECT 'g' || c_custkey AS genome_id,
           'd__Bacteria;p__' || c_nationkey AS taxonomy,
           CAST(c_custkey % 7 AS INTEGER) AS false_positives,
           CAST(c_custkey % 5 AS INTEGER) AS false_negatives,
           CAST(c_custkey % 20 AS INTEGER) AS true_positives,
           CAST(c_custkey % 10 AS INTEGER) AS true_negatives,
           floor((c_acctbal / 100) * 100 + 0.5) / 100 AS avg_gaps,
           CASE WHEN c_custkey % 3 = 0 THEN 'pangenome'
                WHEN c_custkey % 3 = 1 THEN 'user' ELSE 'experiment' END AS source
         FROM customer""",
    "tbl_growth_detailed" ->
      """SELECT 'g' || (user_id % 20) AS genome_id,
           'phen' || (event_id % 50) AS phenotype_id,
           CASE WHEN event_type = 'purchase' THEN 'P'
                WHEN event_type = 'error' THEN 'N' ELSE 'A' END AS "class",
           floor((value / 100) * 10000 + 0.5) / 10000 AS simulated_objective,
           CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE 0.0 END::DOUBLE AS observed_objective,
           CAST(event_id % 5 AS INTEGER) AS gap_count,
           'rxn' || (event_id % 7) AS gapfilled_reactions
         FROM events""")
}
