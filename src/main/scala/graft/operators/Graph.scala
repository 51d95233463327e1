package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over relationally-derived edges — beyond the
  * reference (SURVEY.md §2.6: no iterative operators on its wire), but a
  * staple of corpus curation (site-level authority scores feed quality
  * weighting, cf. the page-quality signals in Gopher/CCNet-style
  * pipelines).
  *
  * PageRank here runs a FIXED iteration count so it is exactly
  * oracle-checkable: the DuckDB oracle unrolls the same three Jacobi
  * steps as chained CTEs. The per-iteration shape is the scale-portable
  * one — contributions are an edge⋈rank join aggregated by destination
  * (two-phase sum), never a driver-side adjacency walk; node count enters
  * only as the teleport constant. Dangling mass is deliberately dropped
  * (no out-edge nodes redistribute nothing) — both engines implement the
  * same convention, and ranks then sum to <1 by the dangling share.
  * [[graft.operators.Dedup]]'s label-propagation clusters already prove
  * the checkpoint-hygiene pattern for loops long enough to need it; three
  * iterations stay within plain lineage.
  */
object Graph {

  private val Damping = 0.85
  // 0.15 literal, NOT 1.0-Damping: the latter differs by one ulp from the
  // oracle's 0.15 (0.85 is not exactly representable), and the oracle
  // computes with the 0.15 double.
  private val Teleport = 0.15
  private val Iters = 3

  /** Nation-level trade graph: an edge src→dst when a customer in nation
    * `src` bought from a supplier in nation `dst`. Edge derivation is the
    * heavy part at 100 TB — three shuffle joins and a distinct — so it is
    * eagerly `localCheckpoint`ed once (|nations|² rows max) and every
    * iteration's plan reads those materialized blocks instead of
    * re-deriving; iterations themselves touch only |nations|-sized frames
    * (broadcast-joined automatically). Three iterations keep lineage
    * depth trivially bounded; a convergence-driven loop would add the
    * per-round checkpoint/unpersist hygiene
    * [[Dedup.connectedComponents]] demonstrates.
    */
  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val nation = Tables.load(s, d, "nation")
    val edges = Tables.load(s, d, "customer")
      .join(Tables.load(s, d, "orders"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(s, d, "supplier"),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .distinct().localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = nation.select(col("n_nationkey").as("node"))
    // Node-dimension cardinality for the teleport constant: k-sized
    // metadata (|nation| = 25), same class as the IVF centroid fetch —
    // not a data-path collect.
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to Iters) {
      val contrib = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(Teleport / n) +
            lit(Damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    ranks.join(nation, col("n_nationkey") === col("node"))
      .select(col("n_name").as("nation"),
              round(col("rank"), 6).as("pagerank"))
      .orderBy(col("pagerank").desc, col("nation"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank _
  )

  private def iterCte(prev: String, name: String): String = s"""
    $name AS (SELECT nd.node,
                     0.15/(SELECT cnt FROM nn) +
                     0.85*COALESCE(SUM(p.rank/deg.outdeg), 0) AS rank
              FROM (SELECT n_nationkey AS node FROM nation) nd
              LEFT JOIN edges e ON e.dst = nd.node
              LEFT JOIN deg ON deg.src = e.src
              LEFT JOIN $prev p ON p.node = e.src
              GROUP BY nd.node)"""

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> s"""
      WITH edges AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
                     FROM customer c
                     JOIN orders o ON o.o_custkey = c.c_custkey
                     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     JOIN supplier s ON s.s_suppkey = l.l_suppkey),
           deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nation),
           r0 AS (SELECT n_nationkey AS node, 1.0/(SELECT cnt FROM nn) AS rank
                  FROM nation),
           ${iterCte("r0", "r1")},
           ${iterCte("r1", "r2")},
           ${iterCte("r2", "r3")}
      SELECT n.n_name AS nation, ROUND(r3.rank, 6) AS pagerank
      FROM r3 JOIN nation n ON n.n_nationkey = r3.node
      ORDER BY pagerank DESC, nation"""
  ).map { case (k, v) => k -> v.stripMargin.trim }
}
