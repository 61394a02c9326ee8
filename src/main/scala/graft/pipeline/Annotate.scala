package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Stage 2 — annotation by protein-hash identity (reference:
  * berdl/berdl/query/query_ontology_local.py:37-176).
  *
  * The reference fetches annotations per genome by filtering local
  * Parquet stores on `_id IN (hashes)`; re-expressed as ONE hash
  * equi-join per store, so a million-genome batch is a single shuffle
  * (or broadcast when the store side is a small dimension).
  */
object Annotate {

  /** Derive the content-addressed join key (reference hash_seq.py:4-27:
    * sha256 of upper-cased sequence, trailing '*' stripped). */
  def withProteinHash(features: DataFrame, seqCol: String): DataFrame =
    features.withColumn("protein_hash", Hashes.proteinHash(col(seqCol)))

  /** Attach one annotation store's terms by hash identity: left join on
    * `_id`, multi-valued terms kept as arrays internally and rendered
    * `'; '`-joined only at this serving edge (SURVEY §1.2 cleanup;
    * reference joins per-row dicts: query_ontology_local.py:78-136). */
  def hashAnnotate(features: DataFrame, store: DataFrame,
                   termsCol: String, as: String): DataFrame =
    features.join(store, features("protein_hash") === store("_id"), "left")
      .drop("_id")
      .withColumn(as, concat_ws("; ", array_sort(coalesce(col(termsCol),
        array().cast("array<string>")))))
      .drop(termsCol)

  /** Dedup-before-expensive-compute (reference u_proteins dict:
    * pangenome.py:22-68): unique protein hashes, lowest feature id
    * kept as the representative. */
  def uniqueProteins(features: DataFrame, idCol: String): DataFrame =
    features.groupBy(col("protein_hash"))
      .agg(min(col(idCol)).as("rep_feature"), count(lit(1)).as("n_copies"))
}
