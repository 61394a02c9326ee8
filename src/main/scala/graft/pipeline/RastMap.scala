package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAST→SEED/SSO role-dictionary annotation mapping (SURVEY §2.9).
  *
  * Reference semantics re-expressed Spark-first:
  *  - `RASTSeedMapper.map_all_annotations`
  *    (lib/KBDatalakeApps/KBDatalakeUtils.py:2742-2897): a RAST
  *    annotation string maps to EVERY dictionary role it contains —
  *    tried whole, then split on the multi-function separators
  *    `' / '`, `' @ '`, `'; '`.
  *  - `TransformOntologyRASTToSSO.normalize_role`
  *    (berdl/berdl/ontology/transform.py:5-29, via public
  *    modelseedpy.core.msgenome.normalize_role): dictionary keys and
  *    candidates are matched on the NORMALIZED role — lowercased with
  *    every non-alphanumeric character removed — so punctuation/case
  *    variants of the same role still hit.
  *
  * Scale shape: the role dictionary is small (SEED has ~10⁴ roles) and
  * the annotation table is the 100 TB side, so the join is an explicit
  * `broadcast` hash join on the normalized role — annotations never
  * shuffle. The separator split is one codegen `split` + `explode`
  * (bounded fan-out: a handful of functions per annotation), not a
  * per-row loop.
  */
object RastMap {

  /** The reference's multi-function separators, as one split regex. */
  val SeparatorRegex = " / | @ |; "

  /** `normalize_role`: lowercase, strip all non-alphanumerics. */
  def normalizeRole(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]", "")

  /** All candidate role strings of an annotation: the whole string plus
    * its multi-function parts, trimmed, de-duplicated, empties dropped
    * (mirrors `split_multi_function` + the whole-string direct try). */
  def candidateParts(annotation: Column): Column =
    filter(
      array_distinct(concat(array(trim(annotation)),
        transform(split(annotation, SeparatorRegex), p => trim(p)))),
      p => length(p) > 0)

  /** Normalized role dictionary from (label, roleId) rows. One row per
    * (normalized label, roleId); a normalized label may map to several
    * ids (the reference keeps a set — transform.py:20-21). */
  def roleDictionary(labels: DataFrame, labelCol: String,
                     roleIdCol: String): DataFrame =
    labels.select(normalizeRole(col(labelCol)).as("__nrole"),
      col(roleIdCol).as("seed_role_id")).distinct()

  /** `map_all_annotations` over a whole annotation table: returns
    * (annotation row keys..., matched_part, seed_role_id) — one output
    * row per (candidate part × dictionary hit). Unmatched annotations
    * produce no rows (reference returns an empty list). */
  def mapAllAnnotations(annotations: DataFrame, annCol: String,
                        dictionary: DataFrame): DataFrame = {
    val exploded = annotations
      .withColumn("matched_part", explode(candidateParts(col(annCol))))
      .withColumn("__nrole", normalizeRole(col("matched_part")))
    exploded.join(broadcast(dictionary), Seq("__nrole")).drop("__nrole")
  }
}
