package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.PipeTool

/** External-tool pipe boundary (reference: skani/MMseqs2 subprocess
  * drivers, berdl/berdl/tools/skani.py:5-32, pangenome.py:116-152).
  * Stand-in tools are awk/sh so the suite needs no bioinformatics
  * binaries; the boundary under test — per-partition process, FASTA
  * stdin, TSV stdout, exit-code propagation — is the real one.
  */
class PipeToolSpec extends SparkTestBase {
  import spark.implicits._

  private val outSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("seq_len", LongType),
    StructField("gc", LongType)))

  private val gcTool = Seq("awk",
    """function emit() { if (id != "") { l = length(s); n = gsub(/[GC]/, "", s); print id "\t" l "\t" n } }
      |/^>/ { emit(); id = substr($0, 2); s = ""; next }
      |{ s = s $0 }
      |END { emit() }""".stripMargin)

  test("pipeFasta round-trips every record through the tool, per partition") {
    val df = Seq(
      ("a", "GATTACA"), ("b", "GGCC"), ("c", "TTTT"), ("d", "")
    ).toDF("id", "seq").repartition(3)
    val got = PipeTool.pipeFasta(df, "id", "seq", gcTool, outSchema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 7L, 2L), ("b", 4L, 4L), ("c", 4L, 0L), ("d", 0L, 0L)))
  }

  test("large partition streams without pipe-buffer deadlock") {
    // >1 MiB through stdin AND stdout of a single partition's process:
    // only safe when stdin is fed concurrently with stdout consumption.
    val n = 20000
    val df = (1 to n).map(i => (s"s$i", "ACGT" * 20)).toDF("id", "seq").coalesce(1)
    val got = PipeTool.pipeFasta(df, "id", "seq", gcTool, outSchema)
    assert(got.count() == n)
    assert(got.agg(sum("gc")).as[Long].head() == n.toLong * 40)
  }

  test("non-zero tool exit fails the task with stderr attached") {
    val df = Seq(("a", "ACGT")).toDF("id", "seq")
    val bad = Seq("sh", "-c", "echo boom >&2; exit 3")
    val e = intercept[org.apache.spark.SparkException] {
      PipeTool.pipeFasta(df, "id", "seq", bad, outSchema).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("exited 3") && msg.contains("boom"))
  }

  test("comment and blank stdout lines are skipped by the TSV parser") {
    val tool = Seq("sh", "-c",
      "echo '# header'; echo; awk '" +
        """/^>/ { id = substr($0, 2); next } { print id "\t" length($0) "\t" 0 }""" + "'")
    val df = Seq(("x", "ACGTACGT")).toDF("id", "seq").coalesce(1)
    val got = PipeTool.pipeFasta(df, "id", "seq", tool, outSchema).collect()
    assert(got.toSeq == Seq(Row("x", 8L, 0L)))
  }

  test("pipeFastaWithLibrary materializes the library once and joins every query against it") {
    // Library-search shape (skani search --ql query -d library): the
    // tool gets the library path via {} and emits one row per
    // (query, library-entry) pair with a length-delta score.
    val lib = Seq("L1" -> "AAAA", "L2" -> "CCCCCCCC")
    val pairSchema = StructType(Seq(
      StructField("query_id", StringType),
      StructField("lib_id", StringType),
      StructField("len_delta", LongType)))
    // awk reads the library file first (FILENAME != "-"), then queries
    // from stdin, emitting |len(q) - len(lib)| per pair.
    val tool = Seq("sh", "-c",
      """awk 'function flushq() { if (qid != "") { for (i = 1; i <= nl; i++) { d = length(qs) - llen[i]; if (d < 0) d = -d; print qid "\t" lid[i] "\t" d } } }
        |FNR == NR { if (/^>/) { nl++; lid[nl] = substr($0, 2); llen[nl] = 0 } else llen[nl] += length($0); next }
        |/^>/ { flushq(); qid = substr($0, 2); qs = ""; next }
        |{ qs = qs $0 }
        |END { flushq() }' {} -""".stripMargin)
    val queries = Seq(("q1", "AA"), ("q2", "CCCCCC")).toDF("id", "seq").repartition(2)
    val got = PipeTool.pipeFastaWithLibrary(queries, "id", "seq", lib, tool, pairSchema)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("q1", "L1", 2L), ("q1", "L2", 6L),
      ("q2", "L1", 2L), ("q2", "L2", 2L)))
  }

  test("pipe_tool registered query matches a local recomputation on sf0.001") {
    val got = SparkEntry.queries("pipe_tool")(spark, sfSmoke)
    val docs = graft.core.Lakehouse.table(spark, sfSmoke, "documents")
      .select(concat(lit("doc_"), col("doc_id")).as("id"),
        upper(regexp_replace(col("text"), "[^A-Za-z]", "")).as("seq"))
      .select(col("id"), length(col("seq")).cast("long").as("seq_len"),
        (length(col("seq")) - length(regexp_replace(col("seq"), "[GC]", ""))).cast("long").as("gc"))
    assert(got.count() == docs.count() && got.count() > 0)
    assert(got.exceptAll(docs).isEmpty && docs.exceptAll(got).isEmpty)
  }
}
