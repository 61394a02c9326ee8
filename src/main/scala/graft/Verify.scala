package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: only run queries whose name starts with one of
    // the comma-separated prefixes (dev iteration; the driver always
    // passes exactly two)
    // an empty/blank filter means NO filter — Some(Seq()) would dump
    // zero queries and read as a vacuous success
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Seq[String]])
      case Array(a, b, f) => (a, b,
        Some(f.split(',').toSeq.filter(_.nonEmpty)).filter(_.nonEmpty))
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
    // Per-query result manifest: row count, sha256 + size of the dumped
    // part file, and a canonical VALUE hash (column-name-sorted, row-
    // sorted, documented string rendering). The driver's red row can
    // then be diffed against a specific (fixture sha256, output sha256)
    // pair: if a later re-run from the same fixture stamps reproduces
    // the same output sha but the driver recorded a mismatch, the
    // driver compared against regenerated fixtures — provable from the
    // committed manifest alone.
    var manifest = List.empty[String]
    def sha256(p: java.nio.file.Path): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val in = new java.security.DigestInputStream(
        new java.io.BufferedInputStream(Files.newInputStream(p)), md)
      try { val buf = new Array[Byte](1 << 16); while (in.read(buf) >= 0) () }
      finally in.close()
      md.digest().map("%02x".format(_)).mkString
    }
    def valueHash(dir: String): (Long, String) = {
      val df0 = spark.read.parquet(dir)
      val df = df0.select(df0.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
      val rendered = df.collect().map(_.toSeq.map {
        case null => "\u0000NULL"
        case a: Array[_] => a.mkString("[", ",", "]")
        case s: Seq[_]   => s.mkString("[", ",", "]")
        case v => v.toString
      }.mkString("\u0001")).sorted
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rendered.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
      (rendered.length.toLong, md.digest().map("%02x".format(_)).mkString)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // the manifest is diagnostic: a failure computing it (driver
        // memory on a huge collect, an IO hiccup in the listing) must
        // NOT record a successfully-dumped query as failed
        try {
          val listing = Files.list(Paths.get(s"$outDir/$name"))
          val part =
            try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
              .filter(_.toString.endsWith(".parquet")).minBy(_.toString)
            finally listing.close()
          val (rows, vh) = valueHash(s"$outDir/$name")
          manifest ::= s"""  "$name": {"rows": $rows, "part_size": ${Files.size(part)}, "part_sha256": "${sha256(part)}", "value_sha256": "$vh"}"""
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name manifest skipped: ${e.getMessage}")
        }
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("_ERROR"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    Files.writeString(Paths.get(s"$outDir/_results_manifest.json"),
      manifest.reverse.mkString("{\n", ",\n", "\n}"))
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
