package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md). The reference registers tables
  * by name in a client context (reference: rust/client/src/context.rs:49,112-118);
  * here a registered table is a Spark temp view over a parquet scan, so every
  * SQL/DataFrame query plans through Catalyst with full pushdown/pruning.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extended: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extended

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every fixture table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register only the TPC-H star-schema tables. */
  def registerTpch(spark: SparkSession, dir: String): Unit =
    tpch.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
