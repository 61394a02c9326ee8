package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{floor, lit}

package object queries {
  /** Driver contract: (session, sf-dir) → result frame. */
  type QueryFn = (SparkSession, String) => DataFrame

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Lakehouse.table(s, dir, name)

  /** `tbl` + scan-parallelism rebalance for per-row-compute-heavy
    * queries (regex banks, scoring, normalization): see
    * [[graft.operators.Relational.computeRebalance]] — a no-op when
    * the scan already delivers ≥ shuffle-parallelism partitions. */
  def tblSpread(s: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.Relational.computeRebalance(tbl(s, dir, name))

  /** Engine-portable 2/4-decimal rounding: `floor(x*10^n + 0.5) / 10^n`
    * is the same IEEE op sequence in Spark and DuckDB, so differential
    * results are bit-identical even when x sits on a half-unit boundary
    * (where the engines' native round() implementations disagree). */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100
  def round4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000
}
