package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema evolution over an append-only parquet table — the ingest
  * reality at 100 TB: batches written months apart don't share a
  * schema, and a reader that takes the FIRST file's footer silently
  * drops every column added since.
  *
  *  - `readEvolved` reconciles all footers by name (`mergeSchema`):
  *    columns added later read as null in old files, columns removed
  *    later read as null in new ones. The footer merge is a
  *    driver-side metadata operation — no data pass.
  *  - `breakingChanges` is the ingest-time pre-flight: additions and
  *    removals are non-breaking (null-fill), but a TYPE change on an
  *    existing column would fail the merged read at plan time — the
  *    check names the offending columns so an ingest can quarantine
  *    the batch instead of poisoning the table directory.
  */
object SchemaEvolution {

  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** (column, current type, incoming type) for every type conflict. */
  def breakingChanges(current: StructType,
                      incoming: StructType): Seq[(String, DataType, DataType)] =
    current.fields.toSeq.flatMap { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(g) if g.dataType != f.dataType =>
          Some((f.name, f.dataType, g.dataType))
        case _ => None
      }
    }
}
