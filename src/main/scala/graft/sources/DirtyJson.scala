package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dirty-JSON repair (reference: build_berdl_db.py:149-170 strips
  * docker log timestamps from mangled model JSON before parsing;
  * KBDatalakeUtils.py:868-884 similar).
  *
  * A pure column pre-pass: extract the outermost `{...}` span, dropping
  * log prefixes (timestamps) and trailing garbage, then hand the result
  * to the JSON parser. Runs inside codegen — repair at 100 TB costs one
  * projection pass, not a driver-side reparse loop.
  */
object DirtyJson {

  /** Outermost brace span of `c` (greedy), or null if none. */
  def repair(c: Column): Column =
    regexp_extract(c, "(\\{.*\\})", 1)

  /** Repair then extract a JSON path, e.g. `"$.k"`. */
  def repairedField(c: Column, path: String): Column =
    get_json_object(repair(c), path)
}
