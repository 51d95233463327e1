package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - [[ivfTopK]]: real IVF — coarse cells learned by spherical k-means
  *    (Lloyd's, DataFrame-only), the corpus stored PARTITIONED BY cell id,
  *    queries probe only their `nprobe` nearest cells, and the probed-cell
  *    filter reaches the scan as a partition filter (partition pruning,
  *    asserted in PlanSpec). Cuts the scanned corpus by ~cells/nprobe; the
  *    100 TB path.
  *
  * K-means design notes:
  *  - Assignment is SHUFFLE-FREE: centroids are k×dim (driver-sized by
  *    construction, the same contract as any k-means implementation), so
  *    each Lloyd iteration embeds them as literals and computes a row-local
  *    argmax over the k cosines inside whole-stage codegen — a map-only
  *    pass over the corpus, no crossJoin/window.
  *  - The update step is one partial-aggregated groupBy of k·dim cells;
  *    dimension sums are accumulated in DECIMAL so centroid values (and
  *    therefore cell assignments, recall, and test results) are exactly
  *    deterministic across runs and partitionings.
  *  - Init is deterministic: the k lowest vec_ids.
  */
object Similarity {

  private val TopK = 5
  private val NQueries = 10
  private val NProbe = 2
  val NCells = 16
  private val LloydIters = 4

  private def scratch(sub: String) = s"/root/repo/target/scratch/$sub"

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))

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

  /** Row-local nearest-centroid assignment: argmax over k cosine scores
    * computed against centroid literals — no join, no shuffle, codegen'd.
    * Ties break to the smallest cell id (via the negated-cell struct sort).
    */
  private def assignExpr(cents: Seq[(Int, Seq[Double])], v: Column): Column = {
    val scored = cents.map { case (cell, cv) =>
      struct(GraftFunctions.cosine_sim(v, typedLit(cv)).as("ccos"),
             lit(-cell).as("negcell"))
    }
    (-array_max(array(scored: _*)).getField("negcell")).cast(IntegerType)
  }

  /** Spherical k-means centroids via Lloyd's iterations, distributed:
    * map-only assignment (see [[assignExpr]]) + one aggregation per
    * iteration. Only the k×dim centroid table ever reaches the driver.
    */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] = e.orderBy(col("vec_id")).limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toSeq
    for (_ <- 1 to iters) {
      val next = e.select(assignExpr(cents, col("v")).as("cell"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast(DecimalType(30, 16))) / count(lit(1)))
          .cast(DoubleType).as("cx"))
        .collect()
      cents = next.groupBy(_.getInt(0)).map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.toSeq.sortBy(_._1)
    }
    cents
  }

  /** IVF top-k with a configurable probe width (public so the spec can
    * verify recall == 1 at nprobe = NCells and a floor at the default).
    */
  def ivfTopKWithProbes(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, d).cache()
    val cents = kmeansCentroids(e, NCells, LloydIters)

    // cell-bucketed storage: the corpus laid out PARTITIONED BY cell, so a
    // probe reads only its cells' files (at cluster scale: partition-pruned
    // column chunks; here: pruned directories, visible in the plan)
    val bucketPath = scratch("embeddings_ivf")
    e.withColumn("cell", assignExpr(cents, col("v")))
      .write.mode("overwrite").partitionBy("cell").parquet(bucketPath)

    // coarse quantization: nprobe nearest cells per query
    val centsDf = s.createDataFrame(cents).toDF("cell", "cv")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centsDf))
      .select(col("qid"), col("qv"), col("cell"),
        GraftFunctions.cosine_sim(col("qv"), col("cv")).as("ccos"))
      .withColumn("crnk", row_number().over(wq))
      .filter(col("crnk") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))

    // partition pruning: restrict the bucketed scan to the union of probed
    // cells (driver-side metadata decision, k-sized) — the isin predicate
    // lands in the scan's PartitionFilters
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = s.read.parquet(bucketPath)
      .filter(col("cell").isin(probedCells.map(_.asInstanceOf[Any]): _*))

    // fine ranking inside probed cells only
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(GraftFunctions.cosine_sim(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cell"), col("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  private def ivfTopK(s: SparkSession, d: String): DataFrame =
    ivfTopKWithProbes(s, d, NProbe)

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
