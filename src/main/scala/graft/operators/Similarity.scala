package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] column) — beyond the reference surface (SURVEY.md §7.1 M7).
  *
  * Two tiers:
  *  - [[bruteTopK]]: exact cosine top-k, query-batch × corpus join. The
  *    correctness baseline (oracle-checked). At scale this is the pattern
  *    for a *small* query batch against a broadcast-friendly corpus slice;
  *    cost is |Q|·|C|.
  *  - [[ivfTopK]]: IVF-style two-stage search — coarse centroids (here the
  *    per-label means, computed distributedly via posexplode/avg), probe the
  *    nearest `NProbe` cells, exact-rank only within probed cells. Cuts the
  *    scanned corpus by ~cells/NProbe; the 100 TB path where the corpus is
  *    range-partitioned by cell id and only probed cells are read
  *    (partition pruning on the cell column).
  */
object Similarity {

  private val TopK = 5
  private val NQueries = 10
  private val NProbe = 2

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))

  /** Exact brute-force cosine top-k for the first NQueries vectors. */
  private def bruteTopK(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, d).cache()
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = q.crossJoin(e.select(col("vec_id"), col("v")))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(GraftFunctions.cosine_sim(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-label mean vectors, computed distributedly (posexplode → avg per
    * dimension → re-assemble ordered array). No collect; scales with
    * dims × labels.
    */
  def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        p => p.getField("cx")).as("cv"))

  /** IVF-style ANN: nearest NProbe centroids per query, exact rank within
    * probed cells only. Not oracle-checked (recall is approximate by
    * design); mechanism-checked in ScalaTest against [[bruteTopK]].
    */
  private def ivfTopK(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, d).cache()
    val cents = centroids(e)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    // coarse quantization: nearest NProbe cells per query
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col("label"))
    val probes = q.crossJoin(cents)
      .select(col("qid"), col("qv"), col("label"),
        GraftFunctions.cosine_sim(col("qv"), col("cv")).as("ccos"))
      .withColumn("crnk", row_number().over(wq))
      .filter(col("crnk") <= NProbe)
      .select(col("qid"), col("qv"), col("label"))
    // fine ranking inside probed cells
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    probes.join(e.select(col("vec_id"), col("label"), col("v")), Seq("label"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("label"),
        round(GraftFunctions.cosine_sim(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("label"), col("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute_topk" -> bruteTopK _,
    "ann_ivf_topk" -> ivfTopK _
  )

  val oracles: Map[String, String] = Map(
    "ann_brute_topk" -> s"""
      SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, cos FROM (
        SELECT q.vec_id AS qid, e.vec_id AS vec_id,
               round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])), 6) AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])), 6) DESC,
                          e.vec_id) AS rnk
        FROM embeddings q, embeddings e
        WHERE q.vec_id < $NQueries AND q.vec_id <> e.vec_id)
      WHERE rnk <= $TopK
      ORDER BY qid, rnk"""
  ).map { case (k, v) => k -> v.stripMargin.trim }
}
