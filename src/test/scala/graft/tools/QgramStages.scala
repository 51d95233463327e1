package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions => TF}

/** Dev-only: stage-by-stage timing of the dedup_edit_qgram funnel (a
  * stage COPY, diverges from the operator by design — use QgramDrill for
  * the end-to-end number). Not part of the driver contract.
  */
object QgramStages {
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
    GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val K = 10; val Q = 4; val pb = K * Q
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"QSTAGES $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val keyed = docs.select(col("doc_id"), md5(TF.normText(col("text"))).as("gk"))
    val groups = keyed.groupBy(col("gk")).agg(min(col("doc_id")).as("rep")).cache()
    val repIds = groups.select(col("rep").as("doc_id"))
    val n = docs.select(col("doc_id"), TF.normText(col("text")).as("norm"))
      .join(repIds, Seq("doc_id"), "left_semi").cache()
    t("n.count")(n.count())
    val grams = n.select(col("doc_id"), GraftFunctions.char_grams(col("norm"), Q).as("g"))
    t("grams.count")(grams.count())
    val inv = grams.filter(size(col("g")) > pb)
      .select(col("doc_id"), explode(col("g")).as("g0"))
      .select(col("doc_id"), xxhash64(col("g0")).as("s")).cache()
    t("inv.count")(inv.count())
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    t("dfreq.count")(dfreq.count())
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("s"))
    val prefix = inv.join(dfreq, Seq("s"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= pb + 1)
      .select(col("doc_id"), col("s")).cache()
    t("prefix.count")(prefix.count())
    val stats = n.select(col("doc_id"), length(col("norm")).as("l")).cache()
    val prefixS = prefix.join(stats, Seq("doc_id"))
    val lbk = (col("l").cast("long") / K).cast("long")
    val la = prefixS.withColumn("blk", explode(array((-1 to 1).map(o => lbk + o): _*)))
      .select(col("doc_id").as("ida"), col("s"), col("blk"), col("l").as("al"))
    val rb = prefixS.withColumn("blk", lbk)
      .select(col("doc_id").as("idb"), col("s"), col("blk"), col("l").as("bl"))
    val cand = la.join(rb, Seq("s", "blk"))
      .filter(col("ida") < col("idb") && abs(col("al") - col("bl")) <= K)
    t("cand.count")(println("cand rows: " + cand.count()))
    val pairs = cand.select(col("ida"), col("idb"))
      .repartition(32, col("ida"), col("idb")).distinct().cache()
    t("pairs.count")(println("pairs: " + pairs.count()))
    val withNorm = pairs
      .join(n.select(col("doc_id").as("ida"), col("norm").as("na")), Seq("ida"))
      .join(n.select(col("doc_id").as("idb"), col("norm").as("nb")), Seq("idb"))
      .withColumn("ed", levenshtein(col("na"), col("nb")))
      .filter(col("ed") <= K)
    t("lev.count")(println("verified: " + withNorm.count()))
    spark.stop()
  }
}
