package graft

import org.apache.spark.sql.SparkSession

/** Storage-hygiene utility for long-lived sessions. Query builders return
  * LAZY DataFrames, so an operator that `.cache()`s a shared intermediate
  * (dedup shingle sets, ANN corpora) has no safe in-operator point to
  * unpersist — the cache must outlive the caller's terminal action. The
  * contract is therefore: the session owner (Verify, Bench, a user
  * pipeline) calls [[releaseAll]] after the action, which synchronously
  * drops every cached dataset and persistent RDD block (localCheckpoint
  * blocks included). At 100 TB leaked storage blocks are eviction
  * pressure on every subsequent job; `HygieneSpec` asserts each
  * dedup/similarity query leaves zero blocks behind after release.
  *
  * Operators whose builders run driver-controlled actions internally
  * (connected components' convergence loop) do NOT rely on this: they
  * unpersist their intermediates eagerly the moment the dependent round
  * is materialized.
  */
object Caches {
  /** Broadcasts handed out by operator builders (bloom sketches) whose
    * lifetime must outlive the caller's terminal action — same contract
    * as dataset caches. Released with `unpersist` (executor copies drop,
    * the value re-ships lazily if the frame re-executes), never
    * `destroy` (which would break the recompute-don't-fail contract
    * below).
    */
  private val broadcasts =
    scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.broadcast.Broadcast[_]]

  def trackBroadcast(b: org.apache.spark.broadcast.Broadcast[_]): Unit =
    synchronized { broadcasts += b; () }

  /** Synchronously release every cached dataset and persistent RDD block
    * in the session. Safe to call between queries: Dataset caching is
    * registration-based, so later executions simply recompute instead of
    * failing.
    */
  def releaseAll(s: SparkSession): Unit = {
    s.sharedState.cacheManager.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    synchronized {
      broadcasts.foreach(_.unpersist(blocking = false))
      broadcasts.clear()
    }
  }
}
