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
    args.foreach { name =>
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
