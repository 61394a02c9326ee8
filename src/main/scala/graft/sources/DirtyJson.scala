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

  /** Outermost brace span of `c` (greedy), or null if none. DOTALL
    * ((?s)) so a pretty-printed payload spanning lines still repairs —
    * Java regex `.` stops at line terminators by default, which would
    * silently truncate the span to the first line. regexp_extract
    * signals no-match as an empty string; nullif restores the
    * documented null so downstream null-handling (coalesce, filters)
    * sees a real null, not "". */
  def repair(c: Column): Column =
    nullif(regexp_extract(c, "(?s)(\\{.*\\})", 1), lit(""))

  /** Repair then extract a JSON path, e.g. `"$.k"`. */
  def repairedField(c: Column, path: String): Column =
    get_json_object(repair(c), path)
}
