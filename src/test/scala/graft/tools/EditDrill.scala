package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only drill: times dedup_edit_distance END-TO-END through the real
  * operator and dumps the executed plan — the r16 BNLJ pushed-filter
  * regression was chased with a stage-by-stage copy of the pipeline, but
  * a copy silently diverges from the operator it times (r16 review), so
  * the drill now runs only the production entry point. For stage-level
  * timing, temporarily widen the stages to private[graft] instead of
  * copying them. Not part of the driver contract.
  */
object EditDrill {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("dedup_edit_distance")(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"EDIT_DRILL sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    println(df.queryExecution.executedPlan.toString.take(12000))
    graft.Caches.releaseAll(spark)
    spark.stop()
  }
}
