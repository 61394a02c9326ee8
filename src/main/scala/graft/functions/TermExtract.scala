package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex term-extraction bank for ontology identifiers.
  *
  * Reference patterns: lib/KBDatalakeApps/KBDatalakeUtils.py:2241-2250,
  * build_berdl_db.py:84-139,343-357, ontology_enrichment_local.py:277-285.
  * Pure `regexp_extract_all` compositions (codegen'd, no UDF).
  */
object TermExtract {

  /** Ontology-prefix → extraction pattern. Kept to the regex subset
    * shared by Java regex and RE2 so differential SQL oracles match. */
  val patterns: Map[String, String] = Map(
    "GO"   -> "GO:\\d+",
    "EC"   -> "EC:[\\d.-]+",
    "KO"   -> "K\\d{5}",
    "COG"  -> "COG\\d+",
    "PFAM" -> "PF\\d+(?:\\.\\d+)?",
    "SO"   -> "SO:\\d+")

  def extractAll(c: Column, prefix: String): Column =
    regexp_extract_all(c, lit(patterns(prefix)), lit(0))

  /** EC number embedded in a RAST function string: `(EC 1.2.3.4)`.
    * Reference: build_berdl_db.py:84-97. */
  def ecFromRast(c: Column): Column =
    regexp_extract_all(c, lit("\\(EC[: ]*([\\d.-]+)\\)"), lit(1))

  /** Normalize xref prefixes (reference: query_ontology_local.py:68-76):
    * `ko:`→`KEGG:`, `ec:`→`EC:`; strip `UniRef:`. */
  def normalizeXref(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "^ko:", "KEGG:"), "^ec:", "EC:"), "^UniRef:", "")
}
