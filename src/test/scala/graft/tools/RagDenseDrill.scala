package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: end-to-end timing of pipeline_rag_dense through the real
  * operator (EditDrill discipline — production entry point only), with a
  * tpch_q1 control first so host-contended windows are visible in the
  * reading, and a cluster_kmeans point beside it (same Lloyd kernel,
  * embedding-table corpus) to separate kernel cost from the chunk-corpus
  * constant factor. Not part of the driver contract.
  */
object RagDenseDrill {
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
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      graft.Caches.releaseAll(spark)
      s
    }
    time("tpch_q1") // warm-up
    println(f"RAGDENSE_DRILL control_q1=${time("tpch_q1")}%.2f")
    println(f"RAGDENSE_DRILL cluster_kmeans=${time("cluster_kmeans")}%.2f")
    println(f"RAGDENSE_DRILL rag_dense=${time("pipeline_rag_dense")}%.2f")
    println(f"RAGDENSE_DRILL graph_knn=${time("graph_knn")}%.2f")
    spark.stop()
  }
}
