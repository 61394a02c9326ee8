package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Distributed external-tool boundary: stream each partition through a
  * line-oriented subprocess and parse its stdout back into rows.
  *
  * The reference drives native bioinformatics tools out-of-process —
  * skani over genome FASTA (berdl/berdl/tools/skani.py:5-32) and
  * MMseqs2 easy-cluster over a master protein FASTA
  * (berdl/berdl/pangenome/pangenome.py:116-152) — on one node, writing
  * inputs/outputs through the local filesystem. The Spark-first
  * re-expression keeps the tool untouched but makes the BOUNDARY
  * distributed: one subprocess per partition, rows streamed to its
  * stdin in the tool's wire format (e.g. FASTA) and its stdout TSV
  * parsed back into a typed DataFrame, so a 1000-executor cluster runs
  * 1000 tool instances with no shared filesystem and no driver
  * funnel.
  *
  * Scale properties:
  *   - one process spawn per PARTITION (amortized over all its rows),
  *     never per row;
  *   - stdin is fed from a dedicated thread while stdout is consumed
  *     by the task thread, so the OS pipe buffer can never deadlock
  *     regardless of partition size or tool buffering;
  *   - stderr is drained concurrently (a chatty tool can't block) and
  *     its tail is attached to the error when the tool exits non-zero;
  *   - output is consumed lazily as an iterator — a partition's result
  *     set never materializes on-heap beyond Spark's own buffering;
  *   - empty partitions spawn nothing.
  */
object PipeTool {

  /** Stream `df`'s partitions through `cmd`.
    *
    * @param toLines   renders one input row to the tool's stdin lines
    * @param outSchema schema of the parsed tool output
    * @param parseLine parses one stdout line (None = skip, e.g. headers)
    */
  def pipe(df: DataFrame, cmd: Seq[String],
           toLines: Row => Iterator[String],
           outSchema: StructType,
           parseLine: String => Option[Row]): DataFrame = {
    val cmdList = cmd // stable serializable capture
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else runPartition(cmdList, rows, toLines, parseLine)
    }(Encoders.row(outSchema))
  }

  /** FASTA-in / TSV-out convenience matching the reference tools' wire
    * shape: each row becomes a `>`-record from (idCol, seqCol); stdout
    * is tab-separated with columns coerced to `outSchema` (empty field
    * → null; blank lines and `#` comment lines skipped).
    */
  def pipeFasta(df: DataFrame, idCol: String, seqCol: String,
                cmd: Seq[String], outSchema: StructType): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val seqIdx = df.schema.fieldIndex(seqCol)
    pipe(df, cmd,
      r => Iterator(">" + r.getString(idIdx), r.getString(seqIdx)),
      outSchema, tsvParser(outSchema))
  }

  /** Schema-driven TSV line parser (shared by pipeFasta and specs). */
  def tsvParser(schema: StructType): String => Option[Row] = {
    val types = schema.fields.map(_.dataType)
    (line: String) =>
      if (line.isEmpty || line.startsWith("#")) None
      else {
        val parts = line.split("\t", -1)
        require(parts.length == types.length,
          s"tool emitted ${parts.length} fields, schema has ${types.length}: $line")
        val vals = parts.zip(types).map { case (s, t) =>
          if (s.isEmpty) null else t match {
            case StringType  => s
            case LongType    => s.toLong
            case IntegerType => s.toInt
            case DoubleType  => s.toDouble
            case FloatType   => s.toFloat
            case BooleanType => s.toBoolean
            case other => throw new IllegalArgumentException(
              s"unsupported TSV field type $other")
          }
        }
        Some(Row.fromSeq(vals.toIndexedSeq))
      }
  }

  /** Library-search shape (skani `search --ql query -d library`,
    * skani.py:5-32): the small library FASTA is materialized ONCE per
    * executor JVM from broadcast-able (id, seq) pairs, its path handed
    * to the tool via `{}` substitution in `cmd`, and each partition of
    * queries streams through. At 100 TB the queries are the big side
    * (partitioned); the library/sketch is the small side (executor-
    * local file), exactly the reference's asymmetry.
    */
  def pipeFastaWithLibrary(df: DataFrame, idCol: String, seqCol: String,
                           library: Seq[(String, String)],
                           cmd: Seq[String], outSchema: StructType): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val seqIdx = df.schema.fieldIndex(seqCol)
    val lib = library // serializable capture
    val parse = tsvParser(outSchema)
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val libPath = LibraryFiles.materialize(lib)
        val resolved = cmd.map(_.replace("{}", libPath.toString))
        runPartition(resolved, rows,
          (r: Row) => Iterator(">" + r.getString(idIdx), r.getString(seqIdx)),
          parse)
      }
    }(Encoders.row(outSchema))
  }

  // ---- internals ----

  private def runPartition(cmd: Seq[String], rows: Iterator[Row],
                           toLines: Row => Iterator[String],
                           parseLine: String => Option[Row]): Iterator[Row] = {
    val proc = new ProcessBuilder(cmd.asJava).start()

    // If the task ends without draining the output iterator (limit(),
    // downstream failure, parse error), the subprocess and its feeder
    // threads would otherwise outlive the task on a long-lived
    // executor. Tie process lifetime to the task, as Spark's own
    // PipedRDD does.
    Option(org.apache.spark.TaskContext.get()).foreach { tc =>
      tc.addTaskCompletionListener[Unit] { _ =>
        if (proc.isAlive) proc.destroyForcibly()
        try proc.getOutputStream.close() catch { case _: java.io.IOException => () }
        try proc.getInputStream.close() catch { case _: java.io.IOException => () }
        try proc.getErrorStream.close() catch { case _: java.io.IOException => () }
      }
      tc.addTaskFailureListener { (_, _) =>
        if (proc.isAlive) proc.destroyForcibly(); ()
      }
    }

    // stderr drain: keep only a bounded tail for diagnostics.
    val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
    val errThread = new Thread(() => {
      val er = new BufferedReader(new InputStreamReader(proc.getErrorStream, UTF_8))
      try {
        var l = er.readLine()
        while (l != null) {
          errTail.addLast(l)
          while (errTail.size > 20) errTail.pollFirst()
          l = er.readLine()
        }
      } catch { case _: java.io.IOException => () }
      finally er.close()
    }, "pipe-tool-stderr")
    errThread.setDaemon(true)
    errThread.start()

    // stdin feeder: a broken pipe here is not itself fatal — the
    // exit-code check below decides (tools like `head` close early).
    val inThread = new Thread(() => {
      val w = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, UTF_8))
      try {
        rows.foreach { r =>
          toLines(r).foreach { l => w.write(l); w.write('\n') }
        }
        w.flush()
      } catch { case _: java.io.IOException => () }
      finally { try w.close() catch { case _: java.io.IOException => () } }
    }, "pipe-tool-stdin")
    inThread.setDaemon(true)
    inThread.start()

    val out = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))
    new Iterator[Row] {
      private var nextRow: Row = _
      private var done = false
      private def advance(): Unit = {
        while (nextRow == null && !done) {
          val line = out.readLine()
          if (line == null) {
            done = true
            out.close()
            inThread.join()
            val code = proc.waitFor()
            // Let the stderr drain finish before reading its tail, or
            // the diagnostic can race the drain thread and come back
            // truncated. Bounded join: a wedged drain can't hang the task.
            errThread.join(2000)
            if (code != 0)
              throw new RuntimeException(
                s"external tool exited $code: ${cmd.mkString(" ")}\n" +
                  s"stderr tail:\n${errTail.asScala.mkString("\n")}")
          } else parseLine(line).foreach(nextRow = _)
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** Executor-local library-file cache: one temp FASTA per distinct
    * library content per JVM (keyed by content hash), shared by every
    * task/partition on that executor.
    */
  private object LibraryFiles {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, Path]()
    // Content digest, not Seq.hashCode: a 32-bit hash collision between
    // two distinct libraries in one executor JVM would silently hand the
    // tool the wrong library file.
    private def digest(lib: Seq[(String, String)]): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      lib.foreach { case (id, seq) =>
        md.update(id.getBytes(UTF_8)); md.update(0.toByte)
        md.update(seq.getBytes(UTF_8)); md.update(1.toByte)
      }
      md.digest().map("%02x".format(_)).mkString
    }
    def materialize(lib: Seq[(String, String)]): Path =
      cache.computeIfAbsent(digest(lib), _ => {
        val p = Files.createTempFile("graft_pipe_lib_", ".fasta")
        p.toFile.deleteOnExit()
        val text = lib.map { case (id, seq) => s">$id\n$seq" }.mkString("", "\n", "\n")
        Files.write(p, text.getBytes(UTF_8))
        p
      })
  }
}
