package graft

import org.apache.spark.sql.SparkSession

/** By-hand plan audit harness (the batch sibling of [[StreamAudit]], not
  * part of the gate): prints the executed physical plan of named
  * `SparkEntry.queries` rows so shuffle counts, join strategies, and
  * codegen spans can be eyeballed after every operator change.
  *
  * Usage: `sbt "runMain graft.PlanAudit <sfDir> <row> [<row>...]"`.
  *
  * With `SPARK_GRAFT_PLAN_OUT=<dir>` set, additionally writes each row's
  * FULL `explain("formatted")` output to `<dir>/<row>_<suffix>.txt`
  * (suffix from `SPARK_GRAFT_PLAN_SUFFIX`, default `plan`) — the
  * committed before/after evidence format for optimization rounds.
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
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    outDir.foreach(d => new java.io.File(d).mkdirs(): Unit)
    try for (q <- args.drop(1)) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, args(0))
      println(df.queryExecution.executedPlan.toString.take(12000))
      outDir.foreach { d =>
        // ADVICE r18: two-arg Paths.get so a suffix with a path
        // separator cannot escape the output directory
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${q}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)): Unit
      }
      Caches.releaseAll(spark)
    } finally spark.stop()
  }
}
