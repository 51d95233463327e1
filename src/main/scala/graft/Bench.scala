package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Measurement notes:
  *  - results go to the `noop` sink, so the full plan (projections included)
  *    executes without driver-side collection skew;
  *  - a warm-up pass (session init + one scan-agg) runs untimed, so JIT/
  *    classloading isn't attributed to an arbitrary first query;
  *  - each query runs ITERS times and the per-query number is the MEDIAN —
  *    sub-2 s queries on a shared box are too noisy for single-shot
  *    round-over-round comparison;
  *  - a failing query is reported in "failed" and nulls the headline total
  *    (a broken query must never make the total look better);
  *  - queries run in sorted name order for run-to-run comparability;
  *  - `SPARK_GRAFT_BENCH_ONLY=q1,q2` restricts the run to named queries
  *    (dev iteration aid; the driver runs the full set);
  *  - "sf1_q1" is TPC-H q1 at SF≈1: the input lineitem deterministically
  *    replicated ×10 with per-replica l_orderkey offsets (so key
  *    distributions scale like real SF=1 data, not 10 identical copies),
  *    built once under the scratch root — the apples-to-apples point
  *    against the reference's published 1956 ms SF=1 q1 (BASELINE.md).
  */
object Bench {
  private val Iters = 3
  private val Sf1Reps = 10

  /** Build (once, cached) an SF≈1-equivalent TPC-H dir: lineitem ×Sf1Reps
    * with offset order keys; the six small tables copied as-is.
    */
  private def ensureSf1Dir(spark: SparkSession, sfDir: String): String =
    Scratch.ensure(spark,
      s"sf1eq_v1_${Sf1Reps}_${Scratch.sanitize(sfDir)}_" +
        Scratch.fingerprint(s"$sfDir/lineitem.parquet")) { dir =>
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val step = li.agg(max(col("l_orderkey"))).head().getLong(0) + 1
      li.crossJoin(broadcast(spark.range(Sf1Reps).select(col("id").as("rep"))))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * step)
        .drop("rep")
        // a real SF1 table is many files/row-groups; one 6M-row row group
        // would serialize the scan onto a single core
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      for (t <- Tables.tpch if t != "lineitem")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
          java.nio.file.Paths.get(s"$dir/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }

    def medianOf(name: String, dir: String): Either[String, Double] = {
      val runs = (1 to Iters).map(_ => runOnce(name, dir))
      // between QUERIES, not iterations: iterations legitimately reuse a
      // query's own caches (that is the cache's job), but blocks must not
      // leak into the next query's measurement or pin memory for the run
      Caches.releaseAll(spark)
      val times = runs.collect { case Right(t) => t }
      if (times.size == Iters) Right(median(times))
      else Left(runs.collectFirst { case Left(e) => e }.getOrElse("unknown"))
    }

    // untimed warm-up: session, codegen, parquet footers
    runOnce("tpch_q6", sfDir)

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results: Seq[(String, Either[String, Double])] =
      names.map(n => n -> medianOf(n, sfDir))
    val qs = results.map {
      case (k, Right(t)) => s""""$k":$t"""
      case (k, Left(_)) => s""""$k":null"""
    }.mkString("{", ",", "}")

    // same-scale baseline point (untimed build; timed like any query);
    // dev-filtered runs skip it unless "sf1_q1" is named in the filter.
    // None = skipped, Left = failed (reported in "failed", never silent).
    val sf1: Option[Either[String, Double]] =
      if (only.exists(!_.contains("sf1_q1"))) None
      else Some(
        try medianOf("tpch_q1", ensureSf1Dir(spark, sfDir))
        catch {
          case e: Throwable => Left(s"sf1 build: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120))
        })
    val sf1Json = sf1 match {
      case Some(Right(t)) => t.toString
      case _ => "null"
    }
    val failed = (results.collect { case (k, Left(e)) =>
        s""""$k":"${Json.escape(e)}""""
      } ++ (sf1 match {
        case Some(Left(e)) => Seq(s""""sf1_q1":"${Json.escape(e)}"""")
        case _ => Nil
      })).mkString("{", ",", "}")
    val anyFailed = results.exists(_._2.isLeft)
    // an all-unknown filter must not read as a perfect 0.0-second run
    val total =
      if (anyFailed || names.isEmpty) "null"
      else results.collect { case (_, Right(t)) => t }.sum.toString

    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$Iters,""" +
      s""""queries":$qs,"failed":$failed,"sf1_q1":$sf1Json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
