package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The driver has regenerated `events.ts` across rounds as INT64
    * TIMESTAMP(NANOS) and (round 8) as µs TIMESTAMP_NTZ. Normalize every
    * encoding to Spark's session-zoned TIMESTAMP at the load boundary so
    * operators, SQL views, and specs all see ONE stable type. Every graft
    * session runs in UTC, so the NTZ reinterpretation is exactly the
    * naive-timestamp semantics the DuckDB oracle applies — values are
    * unchanged, only the type adjusts.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.collectFirst { case f if f.name == "ts" => f.dataType } match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** Register every fixture table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register only the TPC-H star-schema tables. */
  def registerTpch(spark: SparkSession, dir: String): Unit =
    tpch.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
