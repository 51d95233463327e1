package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Streaming-shaped operators over the `events` table — beyond the
  * reference surface (it has no streaming at all, SURVEY.md §2.6); built on
  * the Structured Streaming model where the *same* windowed-aggregation
  * plan runs in batch and in streaming mode.
  *
  * The driver-checked queries below run the batch form (DuckDB-oracle-able);
  * [[readEventStream]] + the specs run the identical transforms through
  * `readStream` with watermarks/memory-sink to prove streaming execution.
  */
object Streaming {

  /** The events parquet carries TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read nanos as long and truncate to Spark's native µs
    * precision (same truncation DuckDB applies casting ns→µs).
    *
    * The conf belongs in session construction (graft's own entry points —
    * Bench, Verify, the test session — all set it there); [[ensureNanosConf]]
    * is a defensive guard for externally-constructed sessions (e.g. the
    * driver calling SparkEntry.entry with its own SparkSession). It forces
    * the conf to true whenever it isn't already — without it every events
    * read throws on the NANOS column, so callers of the events operators
    * have opted into this semantic; after the first call it is a no-op.
    */
  private def ensureNanosConf(s: SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosConf(s)
    val raw = Tables.load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Tumbling 1-hour window aggregation (event-time). */
  def windowAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  private def streamWindowAgg(s: SparkSession, d: String): DataFrame =
    windowAgg(events(s, d)).orderBy(col("window_start"), col("event_type"))

  /** Session windows (30-minute gap) per user — Spark's session_window;
    * the oracle reproduces it with gaps-and-islands SQL.
    */
  private def streamSessionAgg(s: SparkSession, d: String): DataFrame =
    events(s, d).filter(col("user_id") < 20)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Sliding windows (1 hour, sliding 30 min). */
  private def streamSlidingAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))
      .orderBy(col("window_start"))

  /** JSON property extraction from the event payload. */
  private def streamJsonProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** The streaming source form of the events table (same schema), for
    * running the transforms above under `readStream` — used by the specs.
    */
  def readEventStream(s: SparkSession, d: String): DataFrame = {
    ensureNanosConf(s)
    val rawSchema = Tables.load(s, d, "events").schema // ts arrives as LONG ns
    val st = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    if (rawSchema("ts").dataType == LongType)
      st.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else st
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> streamWindowAgg _,
    "stream_session_agg" -> streamSessionAgg _,
    "stream_sliding_agg" -> streamSlidingAgg _,
    "stream_json_props" -> streamJsonProps _
  )

  val oracles: Map[String, String] = Map(
    "stream_window_agg" -> """
      SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream_session_agg" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id < 20),
      sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sessions GROUP BY user_id, sid
      ORDER BY user_id, session_start""",
    "stream_sliding_agg" -> """
      WITH slid AS (
        SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP)
                 - CASE WHEN k = 1 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                 AS window_start,
               value
        FROM events, (SELECT unnest([0, 1]) AS k))
      SELECT window_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM slid GROUP BY window_start ORDER BY window_start""",
    "stream_json_props" -> """
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""
  ).map { case (k, v) => k -> v.stripMargin.trim }
}
