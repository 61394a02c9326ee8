package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.operators.Relational

/** Scalar function bank (SURVEY §2.7 C1-C14) — regex extraction and
  * substitution, split/explode, hashing, coordinate math, rounding,
  * classification chains, JSON access, regex predicates.
  *
  * All pure `functions._` compositions: they stay inside whole-stage
  * codegen and never leave the executor.
  */
object ScalarQueries {

  val queries: Map[String, QueryFn] = Map(
    // C1: regex extract-all of term identifiers
    // (reference ID banks: KBDatalakeUtils.py:2241-2250).
    "c1_regex_extract" -> ((s, d) => {
      tbl(s, d, "documents").select(
        col("doc_id"),
        concat_ws(";", regexp_extract_all(col("text"), lit("\\bs\\w+"), lit(0)))
          .as("s_terms"))
    }),

    // C1b: the ontology term-extraction bank over RAST-style annotation
    // strings (reference patterns: KBDatalakeUtils.py:2241-2250,
    // build_berdl_db.py:84-97). Annotation text synthesized from row
    // keys so both engines extract from identical strings.
    "c1_term_bank" -> ((s, d) => {
      import graft.functions.TermExtract
      val ann = concat(lit("hydrolase (EC 1.2.3."), col("l_linenumber"),
        lit(") GO:000"), pmod(col("l_orderkey"), lit(97)),
        lit(" ko:K"), lpad(pmod(col("l_orderkey"), lit(1000)).cast("string"), 5, "0"))
      tblSpread(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws(";", TermExtract.ecFromRast(ann)).as("ec_terms"),
        concat_ws(";", TermExtract.extractAll(ann, "GO")).as("go_terms"),
        concat_ws(";", TermExtract.extractAll(ann, "KO")).as("ko_terms"),
        TermExtract.normalizeXref(concat(lit("ko:K"),
          lpad(pmod(col("l_orderkey"), lit(1000)).cast("string"), 5, "0"))).as("xref_norm"))
    }),

    // C2: regex substitution (reference: ontology_enrichment_local.py:171).
    "c2_regex_replace" -> ((s, d) => {
      tbl(s, d, "part").select(
        col("p_partkey"),
        lower(regexp_replace(col("p_type"), "\\s+", "_")).as("type_slug"))
    }),

    // C3: split + explode of multi-value cells (reference: datalake_table.py:190-193).
    "c3_split_explode" -> ((s, d) => {
      tbl(s, d, "documents").filter(col("lang") === "fr")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
    }),

    // C4: prefix strip/normalize (reference clean_bakta_value:
    // query_ontology_local.py:68-76; ko:->KEGG: KBDatalakeUtils.py:2565-2574).
    "c4_prefix_norm" -> ((s, d) => {
      tbl(s, d, "customer").join(tbl(s, d, "orders"),
          col("c_custkey") === col("o_custkey"))
        .select(
          col("o_orderkey"),
          regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("priority"),
          regexp_replace(col("c_name"), "^Customer#", "").cast("bigint").as("cust_id"))
    }),

    // C5: content hashing — md5 + normalized sha256
    // (reference: hash_seq.py:4-27, build_berdl_db.py:437-438).
    "c5_hashes" -> ((s, d) => {
      tbl(s, d, "documents").select(
        col("doc_id"),
        Hashes.contentHash(col("text")).as("md5_hash"),
        Hashes.proteinHash(col("text")).as("sha_hash"))
    }),

    // C6: case/trim normalization (reference: hash_seq.py:14).
    "c6_trim_upper" -> ((s, d) => {
      tbl(s, d, "supplier").select(
        col("s_suppkey"), upper(trim(col("s_name"))).as("name_norm"))
    }),

    // C7: strand-aware coordinate math, both reference variants
    // (datalake_table.py:16-23 and 430-437).
    "c7_coord_math" -> ((s, d) => {
      val base = tbl(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", lit("-")).otherwise(lit("+")).as("strand"),
        (col("l_orderkey") % 1000).as("p0"),
        (col("l_linenumber") * 100).cast("bigint").as("len"))
      val (start, end) = Relational.strandCoords(col("p0"), col("strand"), col("len"))
      base.select(col("l_orderkey"), col("l_linenumber"), col("strand"),
        start.as("start"), end.as("end"), (end - start + 1).as("length"))
    }),

    // C8: rounding of derived money math (reference: KBDatalakeUtils.py:607,638).
    "c8_round_charge" -> ((s, d) => {
      tbl(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("charge"))
    }),

    // C9/C10: interval classification chain (reference directionality /
    // FVA flux class: KBDatalakeUtils.py:1063-1072, 1750-1767).
    "c9_classify" -> ((s, d) => {
      tbl(s, d, "events").select(
        col("event_id"),
        when(col("value") - 250.0 > 0, lit("forward"))
          .when(col("value") < 0, lit("reverse"))
          .when(col("value") === 0 && col("value") - 250.0 === 0, lit("blocked"))
          .otherwise(lit("reversible")).as("direction"))
    }),

    // C10: FVA-style two-bound flux classification against ±epsilon
    // (reference: KBDatalakeUtils.py:1750-1767).
    "c10_flux_classify" -> ((s, d) => {
      val eps = 1e-6
      val minF = col("l_discount") - 0.05
      val maxF = col("l_tax") - 0.04
      tbl(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(maxF < -eps, lit("essential_reverse"))
          .when(minF > eps, lit("essential_forward"))
          .when(abs(minF) <= eps && abs(maxF) <= eps, lit("blocked"))
          .otherwise(lit("variable")).as("flux_class"))
    }),

    // C12: dictionary substitution inside an equation-like string —
    // ordered fold of replace() over a fixed mapping (reference
    // metabolite-name substitution: KBDatalakeUtils.py:1056-1060).
    // Longest-key-first ordering so 'small ring' wins over 'small'.
    "c12_equation_substitute" -> ((s, d) => {
      val subs = Seq("small ring" -> "annulus-S", "small" -> "compact",
        "red" -> "crimson", "blue" -> "azure", "widget" -> "gadget",
        "bolt" -> "fastener", "gear" -> "cog")
      val equation = concat(col("p_type"), lit(": "), col("p_name"))
      val renamed = subs.foldLeft(equation) { case (c, (k, v)) =>
        replace(c, lit(k), lit(v))
      }
      tbl(s, d, "part").select(col("p_partkey"), renamed.as("equation"))
    }),

    // C11: ID transforms — prefix add + char substitution
    // (reference: prep_genome_set.py:92-98, KBDatalakeUtils.py:402-409).
    "c11_id_transform" -> ((s, d) => {
      tbl(s, d, "customer").select(
        col("c_custkey"),
        concat(lit("CUST_"), col("c_custkey")).as("ext_id"),
        regexp_replace(col("c_name"), "#", "_").as("name_norm"))
    }),

    // C13: JSON field access over a string column
    // (reference: KBDatalakeUtils.py:466-472).
    "c13_json_access" -> ((s, d) => {
      tbl(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
    }),

    // C14: regex predicate filter (reference alphabet checks: hash_seq.py:46-77).
    "c14_rlike_filter" -> ((s, d) => {
      tbl(s, d, "documents")
        .filter(col("text").rlike("spark \\w+ join"))
        .select(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map(
    "c1_regex_extract" ->
      """SELECT doc_id, coalesce(array_to_string(regexp_extract_all(text, '\bs\w+'), ';'), '') AS s_terms FROM documents""",
    "c1_term_bank" ->
      """WITH a AS (SELECT l_orderkey, l_linenumber,
             'hydrolase (EC 1.2.3.' || l_linenumber || ') GO:000' || (l_orderkey % 97)
               || ' ko:K' || lpad((l_orderkey % 1000)::VARCHAR, 5, '0') AS ann
           FROM lineitem)
         SELECT l_orderkey, l_linenumber,
           array_to_string(regexp_extract_all(ann, '\(EC[: ]*([\d.-]+)\)', 1), ';') AS ec_terms,
           array_to_string(regexp_extract_all(ann, 'GO:\d+'), ';') AS go_terms,
           array_to_string(regexp_extract_all(ann, 'K\d{5}'), ';') AS ko_terms,
           regexp_replace('ko:K' || lpad((l_orderkey % 1000)::VARCHAR, 5, '0'), '^ko:', 'KEGG:') AS xref_norm
         FROM a""",
    "c2_regex_replace" ->
      """SELECT p_partkey, lower(regexp_replace(p_type, '\s+', '_', 'g')) AS type_slug FROM part""",
    "c3_split_explode" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents WHERE lang = 'fr')
         GROUP BY word""",
    "c4_prefix_norm" ->
      """SELECT o_orderkey, regexp_replace(o_orderpriority, '^[0-9]-', '') AS priority,
           CAST(regexp_replace(c_name, '^Customer#', '') AS BIGINT) AS cust_id
         FROM customer JOIN orders ON c_custkey = o_custkey""",
    "c5_hashes" ->
      """SELECT doc_id, md5(text) AS md5_hash, sha256(upper(regexp_replace(text, '\*$', ''))) AS sha_hash
         FROM documents""",
    "c6_trim_upper" ->
      "SELECT s_suppkey, upper(trim(s_name)) AS name_norm FROM supplier",
    "c7_coord_math" ->
      """SELECT l_orderkey, l_linenumber, strand,
           CASE WHEN strand = '-' THEN p0 - len + 1 ELSE p0 END AS start,
           CASE WHEN strand = '-' THEN p0 ELSE p0 + len - 1 END AS "end",
           CASE WHEN strand = '-' THEN p0 ELSE p0 + len - 1 END
             - CASE WHEN strand = '-' THEN p0 - len + 1 ELSE p0 END + 1 AS length
         FROM (SELECT l_orderkey, l_linenumber,
                 CASE WHEN l_returnflag = 'R' THEN '-' ELSE '+' END AS strand,
                 l_orderkey % 1000 AS p0, CAST(l_linenumber * 100 AS BIGINT) AS len
               FROM lineitem)""",
    "c8_round_charge" ->
      """SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge
         FROM lineitem""",
    "c9_classify" ->
      """SELECT event_id,
           CASE WHEN value - 250.0 > 0 THEN 'forward'
                WHEN value < 0 THEN 'reverse'
                WHEN value = 0 AND value - 250.0 = 0 THEN 'blocked'
                ELSE 'reversible' END AS direction
         FROM events""",
    "c10_flux_classify" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_tax - 0.04 < -0.000001 THEN 'essential_reverse'
                WHEN l_discount - 0.05 > 0.000001 THEN 'essential_forward'
                WHEN abs(l_discount - 0.05) <= 0.000001 AND abs(l_tax - 0.04) <= 0.000001 THEN 'blocked'
                ELSE 'variable' END AS flux_class
         FROM lineitem""",
    "c12_equation_substitute" ->
      """SELECT p_partkey,
           replace(replace(replace(replace(replace(replace(replace(
             p_type || ': ' || p_name,
             'small ring', 'annulus-S'), 'small', 'compact'), 'red', 'crimson'),
             'blue', 'azure'), 'widget', 'gadget'), 'bolt', 'fastener'), 'gear', 'cog') AS equation
         FROM part""",
    "c11_id_transform" ->
      """SELECT c_custkey, 'CUST_' || c_custkey AS ext_id, replace(c_name, '#', '_') AS name_norm
         FROM customer""",
    "c13_json_access" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "c14_rlike_filter" ->
      """SELECT doc_id FROM documents WHERE regexp_matches(text, 'spark \w+ join')""")
}
