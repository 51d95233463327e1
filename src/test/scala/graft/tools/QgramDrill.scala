package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only drill: times dedup_edit_qgram END-TO-END through the real
  * operator (the [[EditDrill]] discipline — production entry point only,
  * no stage copies) with a tpch_q1 control first so a host-contended
  * window is visible in the reading itself. Not part of the driver
  * contract.
  */
object QgramDrill {
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
    def time(name: String): Double = {
      // t0 BEFORE construction (the Bench.runOnce convention): operators
      // with eager driver loops (connectedComponents, converged pagerank)
      // do their work at DataFrame construction, and timing only the
      // final write undertimes them to near zero
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      graft.Caches.releaseAll(spark)
      s
    }
    time("tpch_q1") // warm-up (codegen/classload)
    println(f"QGRAM_DRILL control_q1=${time("tpch_q1")}%.2f")
    println(f"QGRAM_DRILL qgram=${time("dedup_edit_qgram")}%.2f")
    println(f"QGRAM_DRILL edit_banded=${time("dedup_edit_distance")}%.2f")
    println(f"QGRAM_DRILL clusters=${time("dedup_clusters")}%.2f")
    println(f"QGRAM_DRILL pagerank_conv=${time("graph_pagerank_converged")}%.2f")
    spark.stop()
  }
}
