package graft

import org.apache.spark.sql.SparkSession

/** Prints `.queryExecution.executedPlan` for the named queries — the
  * source of the curated PLANS.md evidence.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.PlanDump q1_agg j4_star'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // When SPARK_GRAFT_PLAN_DIR is set, ALSO write each query's
    // `.explain("formatted")` to <dir>/<name>_<SPARK_GRAFT_PLAN_SUFFIX
    // (default "plan")>.txt — the round-16 plans/ evidence files.
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    planDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    args.foreach { name =>
      println(s"==== $name ====")
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      println(qe.executedPlan.toString)
      planDir.foreach { d =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"${name}_$suffix.txt"),
          qe.explainString(org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")).getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
