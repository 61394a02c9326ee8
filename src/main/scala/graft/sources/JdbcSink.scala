package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spec of one serving-layer JDBC table (SURVEY §2.1 S10): the
  * reference ships its viewer artifact as a SQLite file per clade with
  * typed DDL, a surrogate `id` column, PRIMARY KEYs and unique
  * natural-key indexes (berdl/berdl/tables/datalake_table.py:86-171,
  * lib/KBDatalakeApps/build_berdl_db.py:961-1000). */
final case class JdbcTableSpec(
    table: String,
    primaryKey: Seq[String] = Nil,
    uniqueIndexes: Map[String, Seq[String]] = Map.empty,
    surrogateId: Option[String] = None)

/** Relational serving sink: DDL with constraints on the driver, bulk
  * row insert through Spark's JDBC writer (executors write batches in
  * parallel). Works against any JDBC database — the engine default
  * stays parquet (SURVEY §2.1), this sink exists for viewer parity
  * where a single-file relational artifact is the contract. A per-clade
  * SQLite/Derby file is inherently single-node; the scale play is the
  * reference's own: partition by clade first, one bounded-size file per
  * clade, written in parallel across clades. */
object JdbcSink {

  /** Spark type → portable DDL affinity, mirroring the reference's
    * SQLite dtype map (INTEGER/REAL/TEXT-ish + VARCHAR bounds). */
  def sqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType                          => "REAL"
    case DoubleType                         => "DOUBLE"
    case BooleanType                        => "BOOLEAN"
    case DateType                           => "DATE"
    case _: TimestampType                   => "TIMESTAMP"
    case d: DecimalType                     => s"DECIMAL(${d.precision},${d.scale})"
    case StringType                         => "VARCHAR(1000)"
    case other =>
      throw new IllegalArgumentException(
        s"no JDBC affinity for ${other.sql}; render it (e.g. '; '-join arrays) before the sink")
  }

  /** CREATE TABLE statement with NOT NULL on key columns and the
    * PRIMARY KEY clause (reference: datalake_table.py:89-100). */
  def createTableDdl(df: DataFrame, spec: JdbcTableSpec): String = {
    val idCol = spec.surrogateId.map(c => s"$c BIGINT NOT NULL").toSeq
    val cols = df.schema.fields.map { f =>
      val notNull = if (spec.primaryKey.contains(f.name)) " NOT NULL" else ""
      s"${f.name} ${sqlType(f.dataType)}$notNull"
    }
    val pkCols = spec.surrogateId.toSeq ++ spec.primaryKey
    val pk = if (pkCols.nonEmpty) Seq(s"PRIMARY KEY (${pkCols.mkString(", ")})") else Nil
    s"CREATE TABLE ${spec.table} (${(idCol ++ cols ++ pk).mkString(", ")})"
  }

  /** Dense 1-based surrogate id without a global single-task sort:
    * row_number within each partition + broadcast per-partition offsets
    * (the per-partition counts are a tiny driver-side list). Ordering
    * inside a partition follows `orderCols` so the numbering is
    * deterministic for a deterministic partitioning. The offsets attach
    * by a BROADCAST JOIN on the partition id, not a chained when()
    * expression — a 10k-partition frame would otherwise codegen a
    * 10k-deep conditional per row. The join is a LEFT join whose
    * null branch RAISES: the counts collect and the final action are
    * two separate executions of `df`, and if a nondeterministic
    * source (or an AQE re-plan) lands rows on a partition id the
    * counts pass never saw, an inner join would silently DROP them
    * and a 0-default offset would mint ids 1..m that COLLIDE with
    * the real partition-0 ids — a downstream PRIMARY KEY violation
    * with no indication of the cause. `coalesce` short-circuits, so
    * the `raise_error` branch costs nothing on the healthy path and
    * fails the job with an explicit message the moment a divergent
    * row appears. Sources fed to the sink must be deterministic
    * (re-read the same files / same shuffle) — that contract is now
    * enforced, not assumed. */
  def withDenseId(df: DataFrame, idCol: String, orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withPid = df.withColumn("__pid", spark_partition_id())
    val counts = withPid.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map {
      case (off, (pid, _)) => (pid, off)
    }
    val offsetDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    withPid.join(broadcast(offsetDf), Seq("__pid"), "left")
      .withColumn(idCol, (row_number().over(w).cast("long")
        + coalesce(col("__off"), raise_error(concat(
            lit("withDenseId: partition id "), col("__pid").cast("string"),
            lit(" was not seen by the counts pass — the source is " +
                "nondeterministic between executions; dense ids would " +
                "collide with partition-0 ids"))).cast("long"))))
      .drop("__pid", "__off")
  }

  /** java.sql.Types code matching [[sqlType]] — the writer's setNull
    * must agree with OUR DDL, not the Spark dialect's preferred type
    * (Spark's Derby dialect maps strings to CLOB, which conflicts with
    * a VARCHAR column on null inserts). */
  private def jdbcTypeCode(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType => java.sql.Types.INTEGER
    case LongType                           => java.sql.Types.BIGINT
    case FloatType                          => java.sql.Types.REAL
    case DoubleType                         => java.sql.Types.DOUBLE
    case BooleanType                        => java.sql.Types.BOOLEAN
    case DateType                           => java.sql.Types.DATE
    case _: TimestampType                   => java.sql.Types.TIMESTAMP
    case _: DecimalType                     => java.sql.Types.DECIMAL
    case _                                  => java.sql.Types.VARCHAR
  }

  /** Create the table (+ unique indexes) and bulk-insert `df` with
    * per-partition batched PreparedStatements (executors write in
    * parallel; batch size bounds memory). Existing same-named tables
    * are dropped first, matching the reference's DROP TABLE IF EXISTS
    * rebuild. */
  def write(df: DataFrame, url: String, spec: JdbcTableSpec,
            batchSize: Int = 500): Unit = {
    val out = spec.surrogateId match {
      case Some(idCol) =>
        val order = if (spec.primaryKey.nonEmpty) spec.primaryKey else df.columns.toSeq
        withDenseId(df, idCol, order)
          .select((idCol +: df.columns.toSeq).map(col): _*)
      case None => df
    }
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE ${spec.table}")
      catch { case _: java.sql.SQLException => () } // didn't exist
      st.executeUpdate(createTableDdl(df, spec))
      spec.uniqueIndexes.foreach { case (name, cols) =>
        st.executeUpdate(
          s"CREATE UNIQUE INDEX $name ON ${spec.table} (${cols.mkString(", ")})")
      }
      st.close()
    } finally conn.close()

    val insertSql = s"INSERT INTO ${spec.table} VALUES " +
      out.columns.map(_ => "?").mkString("(", ", ", ")")
    val typeCodes = out.schema.fields.map(f => jdbcTypeCode(f.dataType))
    val tableUrl = url
    out.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val c = DriverManager.getConnection(tableUrl)
        try {
          c.setAutoCommit(false)
          val ps = c.prepareStatement(insertSql)
          var n = 0
          rows.foreach { row =>
            var i = 0
            while (i < typeCodes.length) {
              if (row.isNullAt(i)) ps.setNull(i + 1, typeCodes(i))
              else ps.setObject(i + 1, row.get(i))
              i += 1
            }
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          c.commit()
          ps.close()
        } finally c.close()
      }
    }
  }
}
