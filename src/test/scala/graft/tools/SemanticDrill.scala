package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.Caches

/** Dev-only drill: times the collapsed vs uncollapsed semantic-dedup
  * pipelines on the SF≈1 replica corpus in one warm session, so the
  * pre-collapse win is measured apples-to-apples (same JVM, same cache
  * state, load-independent ordering alternated). Not part of the driver
  * contract.
  */
object SemanticDrill {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def uncollapsed(corpus: DataFrame): DataFrame = {
      val pairs = Similarity
        .hyperplaneLshPairs(corpus, Similarity.LshThreshold)
        .select(col("vec_a"), col("vec_b"))
      val labels = Dedup.connectedComponents(pairs, maxRounds = 20)
        .select(col("node").as("vec_id"), col("label"))
      corpus.select(col("vec_id"))
        .join(broadcast(labels), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("label"), col("vec_id")).as("cluster"),
          (coalesce(col("label"), col("vec_id")) === col("vec_id")).as("kept"))
        .orderBy(col("vec_id"))
    }

    def time(tag: String)(mk: DataFrame => DataFrame): Double = {
      val corpus = Similarity.lshCorpus(spark, dir).cache()
      val t0 = System.nanoTime()
      val n = mk(corpus).filter(col("kept")).count()
      val s = (System.nanoTime() - t0) / 1e9
      corpus.unpersist(blocking = true)
      Caches.releaseAll(spark)
      println(f"[drill] $tag%-12s $s%8.3f s  kept=$n")
      s
    }

    // warm-up: footers, codegen
    time("warm_new")(Similarity.semanticDedupVerdicts(_))

    // phase drill: where do the seconds go inside the collapsed path?
    {
      val corpus = Similarity.lshCorpus(spark, dir).cache()
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[drill] phase $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        r
      }
      t("corpus_cache")(corpus.count())
      val keyed = corpus.select(col("vec_id"),
        md5(col("v").cast("string")).as("gk"))
      val groups = keyed.groupBy(col("gk")).agg(min(col("vec_id")).as("rep"))
      val reps = corpus.join(groups.select(col("rep").as("vec_id")), Seq("vec_id"))
        .cache()
      t("reps")(reps.count())
      val cand = t("candidates_df")(Similarity.hyperplaneCandidates(reps).cache())
      t("candidates")(cand.count())
      val pairs = cand
        .join(reps.select(col("vec_id").as("vec_a"), col("v").as("va")), Seq("vec_a"))
        .join(reps.select(col("vec_id").as("vec_b"), col("v").as("vb")), Seq("vec_b"))
        .filter(graft.functions.GraftFunctions.cosine_sim(col("va"), col("vb")) >= Similarity.LshThreshold)
        .select(col("vec_a"), col("vec_b")).cache()
      t("verify_pairs")(pairs.count())
      val labels = t("cc")(Dedup.connectedComponents(pairs, maxRounds = 20))
      t("cc_count")(labels.count())
      corpus.unpersist(); reps.unpersist(); cand.unpersist(); pairs.unpersist()
      Caches.releaseAll(spark)
    }

    // alternate to cancel drift
    for (i <- 1 to 2) {
      time(s"old_$i")(uncollapsed)
      time(s"new_$i")(Similarity.semanticDedupVerdicts(_))
    }
    spark.stop()
  }
}
