package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-addressed keys.
  *
  * The reference's signature join identity is a SHA-256 of the
  * normalized (upper-cased, trailing-'*'-stripped) protein sequence
  * (reference: berdl/berdl/hash_seq.py:4-27; used as the join key in
  * berdl/berdl/fitness.py:21-29 and build_berdl_db.py:567-583).
  * Expressed as a pure column composition — stays inside whole-stage
  * codegen, no UDF.
  */
object Hashes {

  /** sha256(upper(seq with trailing '*' removed)) — hex lowercase. */
  def proteinHash(seq: Column): Column =
    sha2(upper(regexp_replace(seq, "\\*$", "")), 256)

  /** Generic content hash for text dedup (md5 hex, like the reference's
    * sequence md5 at build_berdl_db.py:437-438). */
  def contentHash(c: Column): Column = md5(c)

  /** Alphabet predicates (reference: hash_seq.py:46-77). */
  def isStandardAminoAcid(seq: Column): Column =
    upper(seq).rlike("^[ACDEFGHIKLMNPQRSTVWY]*$")
  def isExtendedAminoAcid(seq: Column): Column =
    upper(seq).rlike("^[ACDEFGHIKLMNPQRSTVWYBJOUXZ*-]*$")
}
