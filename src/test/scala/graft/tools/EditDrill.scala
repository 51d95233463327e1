package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions => TF}

/** Dev-only drill: stage-by-stage timing of the dedup_edit_distance
  * pipeline (replicated here because the stages are private) — used to
  * chase the r16 pre-collapse plan regression. Not part of the driver
  * contract.
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
    GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EDIT_DRILL $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val K = 10
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val keyed = docs.select(col("doc_id"),
      md5(TF.normText(col("text"))).as("gk"))
    val groups = keyed.groupBy(col("gk")).agg(min(col("doc_id")).as("rep"))
    val members = keyed.join(groups, Seq("gk"))
    val repIds = groups.select(col("rep").as("doc_id"))
    val shAll = docs.select(col("doc_id"),
        GraftFunctions.word_shingles(TF.words(col("text")), 3).as("sh"))
      .join(repIds, Seq("doc_id"), "left_semi")
    val sh = shAll.filter(size(col("sh")) > 10)
    val bands = graft.operators.Dedup.bandKeys(sh)
    val candidates = bands.select(col("doc_id").as("doc_a"), col("band"),
        col("h1"), col("h2"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("h1"),
        col("h2")), Seq("band", "h1", "h2"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    t("candidates")(println("n_cand=" + candidates.count()))
    val n = docs.select(col("doc_id"), TF.normText(col("text")).as("norm"))
      .join(repIds, Seq("doc_id"), "left_semi")
    val banded = candidates
      .join(n.select(col("doc_id").as("doc_a"), col("norm").as("na")), Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("norm").as("nb")), Seq("doc_b"))
      .filter(abs(length(col("na")) - length(col("nb"))) <= K)
      .withColumn("edit_dist", levenshtein(col("na"), col("nb")))
      .filter(col("edit_dist") <= K)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
    t("banded")(println("n_banded=" + banded.count()))
    def lenBlockedPairs(left: org.apache.spark.sql.DataFrame,
                        right: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val lb = left.select(col("doc_id").as("ida"), col("norm").as("na"))
        .withColumn("lbk", explode(array((-1 to 1).map(o =>
          (length(col("na")).cast("long") / K).cast("long") + o): _*)))
      val rb = right.select(col("doc_id").as("idb"), col("norm").as("nb"),
        (length(col("nb")).cast("long") / K).cast("long").as("lbk"))
      broadcast(lb).join(rb, Seq("lbk"))
        .filter(col("ida") =!= col("idb") &&
          abs(length(col("na")) - length(col("nb"))) <= K)
        .withColumn("edit_dist", levenshtein(col("na"), col("nb")))
        .filter(col("edit_dist") <= K)
        .select(least(col("ida"), col("idb")).as("doc_a"),
                greatest(col("ida"), col("idb")).as("doc_b"),
                col("edit_dist"))
        .distinct()
    }
    val tiny = shAll.filter(size(col("sh")) === 0).select(col("doc_id"))
      .join(n, Seq("doc_id"))
    val tinyPairs = lenBlockedPairs(tiny, n)
    t("tiny")(println("n_tiny=" + tinyPairs.count()))
    val short = shAll
      .filter(size(col("sh")).between(1, 10))
      .select(col("doc_id")).join(n, Seq("doc_id"))
    val shingledN = shAll.filter(size(col("sh")) >= 1)
      .select(col("doc_id")).join(n, Seq("doc_id"))
    val shortPairs = lenBlockedPairs(short, shingledN)
    t("short")(println("n_short=" + shortPairs.count()))
    println(shortPairs.queryExecution.executedPlan.toString.take(9000))
    val repPairs = banded.unionByName(tinyPairs).unionByName(shortPairs)
    val cross = repPairs
      .join(members.select(col("rep").as("doc_a"), col("doc_id").as("ida")),
        Seq("doc_a"))
      .join(members.select(col("rep").as("doc_b"), col("doc_id").as("idb")),
        Seq("doc_b"))
      .select(least(col("ida"), col("idb")).as("doc_a"),
              greatest(col("ida"), col("idb")).as("doc_b"),
              col("edit_dist"))
    val intra = members.select(col("gk"), col("doc_id").as("ida"))
      .join(members.select(col("gk"), col("doc_id").as("idb")), Seq("gk"))
      .filter(col("ida") < col("idb"))
      .select(col("ida").as("doc_a"), col("idb").as("doc_b"),
        lit(0).as("edit_dist"))
    t("full")(println("n_out=" +
      cross.unionByName(intra).orderBy(col("doc_a"), col("doc_b")).count()))
    spark.stop()
  }
}
