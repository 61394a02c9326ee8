package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.pipeline.{RastMap, TableBuild}

/** Ontology-dimension queries (SURVEY §2.9): the RAST→SEED
  * role-dictionary mapper and the ontology_relationships /
  * ontology_definitions table builders, exercised on deterministic
  * fixtures derived from the TPC-H-ish gate tables so DuckDB can
  * mirror them exactly.
  *
  *  - `c15_rast_map`: the role dictionary is built from `part` names
  *    (label → `seed.role:<13-digit min partkey>`); annotations cycle
  *    through the three reference shapes — case/punctuation variant
  *    (normalization must hit), `' / '` multi-function (first part
  *    hits), `'; '` multi-function (second part hits).
  *  - `ontology_rels`: a synthetic triple store over nation/region with
  *    one row-shape per reference filter branch (self-referential edge,
  *    blank-node object, EC: parent hierarchy, irrelevant predicate,
  *    enables_reaction URL predicate).
  *  - `ontology_defs`: static prefix descriptions restricted to
  *    prefixes present in a derived term table.
  */
object OntologyQueries {

  val queries: Map[String, QueryFn] = Map(
    "c15_rast_map" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val labels = part.groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("pk"))
        .select(col("p_name").as("label"),
          concat(lit("seed.role:"),
            lpad(col("pk").cast("string"), 13, "0")).as("role_id"))
      val dict = RastMap.roleDictionary(labels, "label", "role_id")
      val anns = part.select(col("p_partkey").as("ann_id"),
        when(pmod(col("p_partkey"), lit(3)) === 0, upper(col("p_name")))
          .when(pmod(col("p_partkey"), lit(3)) === 1,
            concat(col("p_name"), lit(" / "), col("p_type")))
          .otherwise(concat(col("p_brand"), lit("; "), col("p_name")))
          .as("annotation"))
      RastMap.mapAllAnnotations(anns, "annotation", dict)
        .select(col("ann_id"), col("matched_part"), col("seed_role_id"))
    }),

    "ontology_rels" -> ((s, d) => {
      // One scan + explode builds every statement shape (instead of a
      // 6-branch union re-scanning nation): the shapes that differ from
      // the row-per-branch construction are exactly the ones the
      // builder filters (self-referential, blank-node, EC hierarchy,
      // wrong predicate) or dedups, so the output is identical.
      val nation = tbl(s, d, "nation")
      val region = tbl(s, d, "region")
      val nName = concat(lit("N:"), col("n_name"))
      val rName = concat(lit("R:"), col("r_name"))
      def stmt(s0: Column, p: Column, o: Column) =
        struct(s0.as("subject"), p.as("predicate"), o.as("object"))
      val statements = nation
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(explode(array(
          stmt(nName, lit("rdfs:subClassOf"), rName),
          stmt(rName, lit("rdfs:subClassOf"), rName),
          stmt(nName, lit("rdfs:subClassOf"), lit("_:b1")),
          stmt(concat(lit("EC:1.1.1."), col("n_nationkey").cast("string")),
            lit("rdfs:subClassOf"), lit("EC:1.1.1.-")),
          stmt(nName,
            when(pmod(col("n_nationkey"), lit(2)) === 0,
              lit("<https://modelseed.org/ontology/enables_reaction>"))
              .otherwise("rdfs:label"),
            when(pmod(col("n_nationkey"), lit(2)) === 0,
              concat(lit("seed.reaction:rxn"), col("n_nationkey").cast("string")))
              .otherwise(col("n_name"))))).as("st"))
        .select(col("st.subject"), col("st.predicate"), col("st.object"))
      val termIds = statements.select(col("subject")).distinct()
      TableBuild.ontologyRelationships(statements, termIds)
    }),

    // The third ontology dimension table (reference:
    // KBDatalakeUtils.py:2693-2728 — drop_duplicates(['identifier']) +
    // sort_values(['ontology_prefix','identifier'])), fed by the full
    // enrichment chain: harvested ids (4 colliding shapes so the dedup
    // is exercised) → label/definition lookup from a triple store →
    // EC column (KO map, GO hasDbXref, seed.role label regex, EC copy).
    "tbl_ontology_terms" -> ((s, d) => {
      val pk = col("p_partkey")
      val harvested = tbl(s, d, "part").select(explode(array(
        concat(lit("GO:"), lpad((pk % 400).cast("string"), 7, "0")),
        concat(lit("KEGG:K"), lpad((pk % 300).cast("string"), 5, "0")),
        concat(lit("EC:1.1."), (pk % 50).cast("string"), lit("."), (pk % 7).cast("string")),
        concat(lit("seed.role:"), lpad((pk % 200).cast("string"), 13, "0"))))
        .as("identifier"))
      val k = col("id")
      val goLabels = s.range(0, 400).filter(k % 2 === 0).select(
        concat(lit("GO:"), lpad(k.cast("string"), 7, "0")).as("subject"),
        lit("rdfs:label").as("predicate"),
        concat(lit("go label "), k.cast("string")).as("object"))
      val goDefs = s.range(0, 400).filter(k % 3 === 0).select(
        concat(lit("GO:"), lpad(k.cast("string"), 7, "0")).as("subject"),
        lit("IAO:0000115").as("predicate"),
        concat(lit("go def "), k.cast("string")).as("object"))
      val roleLabels = s.range(0, 200).filter(k % 2 === 0).select(
        concat(lit("seed.role:"), lpad(k.cast("string"), 13, "0")).as("subject"),
        lit("rdfs:label").as("predicate"),
        concat(lit("role "), k.cast("string"),
          when(k % 4 === 0, concat(lit(" (EC 1.2.3."), (k % 6).cast("string"), lit(")")))
            .otherwise(lit("")),
          when(k % 8 === 0, concat(lit(" (TC 9.A."), (k % 5).cast("string"), lit(")")))
            .otherwise(lit(""))).as("object"))
      val statements = goLabels.unionByName(goDefs).unionByName(roleLabels)
      val koToEc = s.range(0, 300).filter(k % 3 === 0).select(
        concat(lit("KEGG:K"), lpad(k.cast("string"), 5, "0")).as("ko_id"),
        concat(lit("EC:3.4."), (k % 11).cast("string"), lit(".1")).as("ec_id"))
        .unionByName(s.range(0, 300).filter(k % 6 === 0).select(
          concat(lit("KEGG:K"), lpad(k.cast("string"), 5, "0")).as("ko_id"),
          lit("EC:3.4.99.-").as("ec_id")))
      val goToEc = s.range(0, 400).filter(k % 5 === 0).select(
        concat(lit("GO:"), lpad(k.cast("string"), 7, "0")).as("go_id"),
        concat(lit("EC:2.7.1."), (k % 9).cast("string")).as("ec_id"))
      TableBuild.withEcColumn(
        TableBuild.ontologyTerms(harvested, statements), koToEc, goToEc)
    }),

    "ontology_defs" -> ((s, d) => {
      val terms = tbl(s, d, "nation").select(
        when(pmod(col("n_nationkey"), lit(3)) === 0, "GO")
          .when(pmod(col("n_nationkey"), lit(3)) === 1, "KEGG")
          .otherwise("seed.role").as("ontology_prefix"))
      TableBuild.ontologyDefinitions(terms)
    }))

  private def defsValuesSql: String =
    TableBuild.ontologyPrefixDescriptions
      .map { case (p, d) => s"('$p', '$d')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "tbl_ontology_terms" ->
      """WITH harvested AS (
           SELECT unnest([
             'GO:' || lpad(CAST(p_partkey % 400 AS VARCHAR), 7, '0'),
             'KEGG:K' || lpad(CAST(p_partkey % 300 AS VARCHAR), 5, '0'),
             'EC:1.1.' || CAST(p_partkey % 50 AS VARCHAR) || '.' || CAST(p_partkey % 7 AS VARCHAR),
             'seed.role:' || lpad(CAST(p_partkey % 200 AS VARCHAR), 13, '0')
           ]) AS identifier FROM part),
         ids AS (SELECT DISTINCT identifier FROM harvested),
         go_labels AS (
           SELECT 'GO:' || lpad(CAST(k AS VARCHAR), 7, '0') AS subject,
                  'go label ' || CAST(k AS VARCHAR) AS object
           FROM range(0, 400) t(k) WHERE k % 2 = 0),
         go_defs AS (
           SELECT 'GO:' || lpad(CAST(k AS VARCHAR), 7, '0') AS subject,
                  'go def ' || CAST(k AS VARCHAR) AS object
           FROM range(0, 400) t(k) WHERE k % 3 = 0),
         role_labels AS (
           SELECT 'seed.role:' || lpad(CAST(k AS VARCHAR), 13, '0') AS subject,
                  'role ' || CAST(k AS VARCHAR)
                    || CASE WHEN k % 4 = 0 THEN ' (EC 1.2.3.' || CAST(k % 6 AS VARCHAR) || ')' ELSE '' END
                    || CASE WHEN k % 8 = 0 THEN ' (TC 9.A.' || CAST(k % 5 AS VARCHAR) || ')' ELSE '' END AS object
           FROM range(0, 200) t(k) WHERE k % 2 = 0),
         labels AS (
           SELECT subject, min(object) AS label FROM
             (SELECT subject, object FROM go_labels
              UNION ALL SELECT subject, object FROM role_labels)
           GROUP BY subject),
         defs AS (SELECT subject, min(object) AS def FROM go_defs GROUP BY subject),
         ko_joined AS (
           SELECT ko_id, string_agg(DISTINCT ec_id, '|' ORDER BY ec_id) AS ec FROM (
             SELECT 'KEGG:K' || lpad(CAST(k AS VARCHAR), 5, '0') AS ko_id,
                    'EC:3.4.' || CAST(k % 11 AS VARCHAR) || '.1' AS ec_id
             FROM range(0, 300) t(k) WHERE k % 3 = 0
             UNION ALL
             SELECT 'KEGG:K' || lpad(CAST(k AS VARCHAR), 5, '0'), 'EC:3.4.99.-'
             FROM range(0, 300) t(k) WHERE k % 6 = 0)
           GROUP BY ko_id),
         go_joined AS (
           SELECT go_id, string_agg(DISTINCT ec_id, '|' ORDER BY ec_id) AS ec FROM (
             SELECT 'GO:' || lpad(CAST(k AS VARCHAR), 7, '0') AS go_id,
                    'EC:2.7.1.' || CAST(k % 9 AS VARCHAR) AS ec_id
             FROM range(0, 400) t(k) WHERE k % 5 = 0)
           GROUP BY go_id),
         base AS (
           SELECT split_part(i.identifier, ':', 1) AS ontology_prefix, i.identifier,
                  coalesce(l.label, '') AS label, coalesce(d.def, '') AS definition
           FROM ids i
           LEFT JOIN labels l ON i.identifier = l.subject
           LEFT JOIN defs d ON i.identifier = d.subject)
         SELECT ontology_prefix, identifier, label, definition,
           CASE WHEN ontology_prefix = 'KEGG' THEN coalesce(k.ec, '')
                WHEN ontology_prefix = 'GO' THEN coalesce(g.ec, '')
                WHEN ontology_prefix = 'seed.role' THEN
                  coalesce(array_to_string(list_concat(
                    list_transform(regexp_extract_all(label, '\(EC\s*([\d.-]+)\)', 1), x -> 'EC:' || x),
                    list_transform(regexp_extract_all(label, '\(TC\s*([\d.\w]+)\)', 1), x -> 'TC:' || x)), '|'), '')
                WHEN ontology_prefix = 'EC' THEN identifier
                ELSE '' END AS ec
         FROM base b
         LEFT JOIN ko_joined k ON b.identifier = k.ko_id
         LEFT JOIN go_joined g ON b.identifier = g.go_id
         ORDER BY ontology_prefix, identifier""",
    "c15_rast_map" ->
      """WITH labels AS (
           SELECT p_name AS label,
             'seed.role:' || lpad(CAST(min(p_partkey) AS VARCHAR), 13, '0') AS role_id
           FROM part GROUP BY p_name),
         dict AS (
           SELECT DISTINCT regexp_replace(lower(label), '[^a-z0-9]', '', 'g') AS nrole,
             role_id AS seed_role_id FROM labels),
         ann AS (
           SELECT p_partkey AS ann_id,
             CASE WHEN p_partkey % 3 = 0 THEN upper(p_name)
                  WHEN p_partkey % 3 = 1 THEN p_name || ' / ' || p_type
                  ELSE p_brand || '; ' || p_name END AS annotation
           FROM part),
         pieces AS (
           SELECT ann_id, piece FROM (
             SELECT ann_id, unnest(list_distinct(list_concat([trim(annotation)],
               list_transform(string_split_regex(annotation, ' / | @ |; '),
                 x -> trim(x))))) AS piece
             FROM ann)
           WHERE length(piece) > 0)
         SELECT ann_id, piece AS matched_part, seed_role_id
         FROM pieces JOIN dict
           ON regexp_replace(lower(piece), '[^a-z0-9]', '', 'g') = dict.nrole""",
    "ontology_rels" ->
      """WITH statements AS (
           SELECT 'N:' || n_name AS subject, 'rdfs:subClassOf' AS predicate,
                  'R:' || r_name AS object
             FROM nation JOIN region ON n_regionkey = r_regionkey
           UNION ALL SELECT 'R:' || r_name, 'rdfs:subClassOf', 'R:' || r_name FROM region
           UNION ALL SELECT 'N:' || n_name, 'rdfs:subClassOf', '_:b1' FROM nation
           UNION ALL SELECT 'EC:1.1.1.' || n_nationkey, 'rdfs:subClassOf', 'EC:1.1.1.-' FROM nation
           UNION ALL SELECT 'N:' || n_name, '<https://modelseed.org/ontology/enables_reaction>',
                  'seed.reaction:rxn' || n_nationkey FROM nation WHERE n_nationkey % 2 = 0
           UNION ALL SELECT 'N:' || n_name, 'rdfs:label', n_name FROM nation)
         SELECT DISTINCT subject,
           CASE predicate WHEN 'rdfs:subClassOf' THEN 'is_a'
                ELSE 'enables_reaction' END AS predicate,
           object
         FROM statements
         WHERE predicate IN ('rdfs:subClassOf',
                 '<https://modelseed.org/ontology/enables_reaction>')
           AND subject <> object
           AND object NOT LIKE '!_:%' ESCAPE '!'
           AND NOT (predicate = 'rdfs:subClassOf'
                    AND (subject LIKE 'EC:%' OR subject LIKE 'SO:%'))""",
    "ontology_defs" ->
      s"""SELECT ontology_prefix, definition
          FROM (VALUES $defsValuesSql) AS t(ontology_prefix, definition)
          WHERE ontology_prefix IN (
            SELECT DISTINCT CASE WHEN n_nationkey % 3 = 0 THEN 'GO'
                 WHEN n_nationkey % 3 = 1 THEN 'KEGG'
                 ELSE 'seed.role' END
            FROM nation)""")
}
