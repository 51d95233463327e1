package graft

import org.apache.spark.sql.SparkSession

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
  *  - queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  private val Iters = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
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

    // untimed warm-up: session, codegen, parquet footers
    runOnce("tpch_q6")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results: Seq[(String, Either[String, Double])] = names.map { n =>
      val runs = (1 to Iters).map(_ => runOnce(n))
      val times = runs.collect { case Right(t) => t }
      n -> (if (times.size == Iters) Right(median(times))
            else Left(runs.collectFirst { case Left(e) => e }.getOrElse("unknown")))
    }
    val qs = results.map {
      case (k, Right(t)) => s""""$k":$t"""
      case (k, Left(_)) => s""""$k":null"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(e)) =>
      s""""$k":"${e.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString("{", ",", "}")
    val anyFailed = results.exists(_._2.isLeft)
    val total =
      if (anyFailed) "null"
      else results.collect { case (_, Right(t)) => t }.sum.toString
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$Iters,""" +
      s""""queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
