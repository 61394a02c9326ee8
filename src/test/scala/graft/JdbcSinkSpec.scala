package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.sources.{JdbcSink, JdbcTableSpec}

/** S10 viewer-parity sink: DDL + constraints + bulk insert against an
  * embedded Derby database (the JDBC engine available in-sandbox; the
  * reference's artifact is SQLite — same single-file embedded shape).
  */
class JdbcSinkSpec extends SparkTestBase {

  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
  private def url(name: String) = s"jdbc:derby:$dbDir/$name;create=true"

  private val genomes = Seq(
    ("GCA_2", Some("d__Bacteria"), Some(123), Some(98.5), Some(410L), "clade"),
    ("GCA_1", Some("d__Archaea"), Some(77), Some(91.2), Some(395L), "clade_member"),
    ("user_g", None, None, None, None, "user"))
    .toDF("genome", "gtdb_taxonomy", "ncbi_taxid", "checkm_completeness", "size", "kind")

  private val spec = JdbcTableSpec(
    table = "genome",
    primaryKey = Seq("genome"),
    uniqueIndexes = Map("idx_genome_kind" -> Seq("genome", "kind")),
    surrogateId = Some("id"))

  test("write creates DDL with PK + index and round-trips the rows") {
    val u = url("db1")
    JdbcSink.write(genomes, u, spec)
    val back = spark.read.jdbc(u, "genome", new java.util.Properties())
    assert(back.count() == 3)
    assert(back.columns.head == "ID" || back.columns.head == "id") // surrogate first
    // dense 1..n ids
    val ids = back.select(col("id").cast("long")).as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    // values survive, including nulls
    // Derby uppercases identifiers; Row.getAs is case-sensitive
    val user = back.filter(col("kind") === "user").collect().head
    assert(user.getAs[Any]("GTDB_TAXONOMY") == null)
  }

  test("primary key rejects duplicate natural keys") {
    val u = url("db2")
    JdbcSink.write(genomes, u, spec.copy(surrogateId = None))
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.executeUpdate(
          "INSERT INTO genome VALUES ('GCA_1', 'x', 1, 1.0, 1, 'clade')")
      }
      st.close()
    } finally conn.close()
  }

  test("rebuild drops and recreates (reference DROP TABLE IF EXISTS semantics)") {
    val u = url("db3")
    JdbcSink.write(genomes, u, spec)
    JdbcSink.write(genomes.limit(2), u, spec)
    val back = spark.read.jdbc(u, "genome", new java.util.Properties())
    assert(back.count() == 2)
  }

  test("array columns are rejected with a render hint, not written broken") {
    val bad = Seq((1L, Seq("a", "b"))).toDF("k", "vals")
    val e = intercept[IllegalArgumentException] {
      JdbcSink.createTableDdl(bad, JdbcTableSpec("t"))
    }
    assert(e.getMessage.contains("render"))
  }
}
