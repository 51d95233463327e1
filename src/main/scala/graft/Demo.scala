package graft

/** Client-facing walkthrough of the [[graft.context.SessionContext]] API —
  * the analog of the reference's integration script
  * (`python/examples/testquery.py`, which registers the TPC-H tables,
  * reads each query's SQL, runs it and collects the result): register →
  * sql → collect → explain over the reference's CI integration set
  * {1,3,5,6,10,12} (reference: rust/benchmarks/tpch/run.sh:6).
  *
  * The SQL texts are [[operators.Tpch.sql]] — the same strings the DuckDB
  * oracle runs, executed here through the registered catalog names rather
  * than pre-wired DataFrames, because that is how a CLIENT of the library
  * drives it.
  *
  * Run: `sbt "runMain graft.Demo /root/testdata/sf0.001"`
  * (optional second arg: comma-separated query names to run instead of
  * the integration set — any key of [[operators.Tpch.sql]]).
  */
object Demo {
  private val IntegrationSet = Seq(
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q12")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else IntegrationSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val ctx = context.SessionContext.local(cpus, cpus)

    // register every fixture table once; queries then resolve by name
    // through the session catalog — the reference script's ctx.register()
    for (t <- Tables.all)
      ctx.registerParquet(t, s"$sfDir/$t.parquet")

    for (name <- names) {
      val df = ctx.sql(operators.Tpch.sql(name))
      println(s"\n=== $name ===")
      ctx.explain(df)
      val t0 = System.nanoTime()
      val rows = ctx.collect(df)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"--- $name: ${rows.length} rows in $sec%.3f s; first ${math.min(5, rows.length)}:")
      rows.take(5).foreach(r => println("    " + r.mkString(" | ")))
    }
    ctx.spark.stop()
  }
}
