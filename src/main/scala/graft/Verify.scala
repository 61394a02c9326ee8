package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: only run queries whose name starts with it
    // (dev iteration; the driver always passes exactly two)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[String])
      case Array(a, b, f) => (a, b, Some(f))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture provenance: snapshot every input file's (size, mtime,
    // sha256) before the first query and again after the last. If the
    // driver's compare later reds a hash while the two snapshots
    // differ, the fixtures were regenerated mid-run (the r6/r7
    // `events`/`shard_manifest` failure mode) — provable, not inferred.
    def fixtureStamp(): String = {
      val listing = java.nio.file.Files.list(Paths.get(sfDir))
      val files =
        try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.toString.endsWith(".parquet")).sortBy(_.toString)
        finally listing.close()
      files.map { p =>
        // streamed digest: O(buffer) memory, not a whole-file byte[]
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val in = new java.security.DigestInputStream(
          new java.io.BufferedInputStream(Files.newInputStream(p)), md)
        try { val buf = new Array[Byte](1 << 16); while (in.read(buf) >= 0) () }
        finally in.close()
        val digest = md.digest().map("%02x".format(_)).mkString
        s"""    "${p.getFileName}": {"size": ${Files.size(p)}, "mtime_ms": ${Files.getLastModifiedTime(p).toMillis}, "sha256": "$digest"}"""
      }.mkString("{\n", ",\n", "\n}")
    }
    Files.writeString(Paths.get(s"$outDir/_fixtures_pre.json"), fixtureStamp())
    // A query that crashes must be VISIBLY red, never silently absent:
    // write an `_ERROR` marker file into its output slot and exit
    // non-zero at the end. (Round-6 lesson: 29 analysis crashes were
    // swallowed here and read as "missing" instead of "failing".)
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.startsWith) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("_ERROR"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_fixtures_post.json"), fixtureStamp())
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
