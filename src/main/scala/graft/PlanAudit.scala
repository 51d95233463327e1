package graft

import org.apache.spark.sql.SparkSession

/** By-hand plan audit harness (the batch sibling of [[StreamAudit]], not
  * part of the gate): prints the executed physical plan of named
  * `SparkEntry.queries` rows so shuffle counts, join strategies, and
  * codegen spans can be eyeballed after every operator change.
  *
  * Usage: `sbt "runMain graft.PlanAudit <sfDir> <row> [<row>...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <row> [<row>...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("plan-audit").getOrCreate()
    try for (q <- args.drop(1)) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, args(0))
        .queryExecution.executedPlan.toString.take(12000))
    } finally spark.stop()
  }
}
