package graft

import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  // Queries whose result can be empty at sf0.001 are still exercised for
  // no-throw; everything else must produce rows.
  private val mayBeEmpty = Set("agg_having")

  for ((name, fn) <- operators.Relational.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("left and right join agree mirrored") {
    val l = operators.Relational.queries("join_left")(spark, sfDir).collect()
    val r = operators.Relational.queries("join_right")(spark, sfDir).collect()
    assert(l.map(_.toSeq.toList).sortBy(_.toString).toList ==
           r.map(_.toSeq.toList).sortBy(_.toString).toList)
  }

  test("union_all count equals sum of branch counts") {
    val rows = operators.Relational.queries("set_union_all")(spark, sfDir).collect()
    val n = rows.head.getAs[Long]("n")
    val nd = rows.head.getAs[Long]("n_distinct")
    assert(n > nd) // overlap exists by construction (nationkey<5 ⊂ <10)
  }
}

/** Plan-shape assertions — the SURVEY §5 layer (b): the optimizations we
  * rely on at 100 TB (pushdown, pruning, partial aggregation, broadcast
  * joins) must be visible in the physical plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("parquet scan gets filter pushdown and column pruning") {
    val p = planOf("scan_parquet")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45"),
           s"no pushed filter in:\n$p")
    // projection pruning: scan must not read all 11 lineitem columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>")
      || p.contains("ReadSchema: struct<l_extendedprice:double,l_quantity:double,l_returnflag:string>")
      || p.contains("ReadSchema: struct<l_returnflag:string,l_quantity:double,l_extendedprice:double>"),
      s"scan not pruned to 3 columns:\n$p")
  }

  test("aggregation is two-phase partial/final") {
    val p = planOf("agg_basic")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("small-dimension joins broadcast (tpch_q5 chain)") {
    val p = planOf("tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in q5:\n$p")
  }

  test("hash repartition produces hashpartitioning exchange") {
    val p = planOf("repartition_hash")
    assert(p.contains("hashpartitioning(l_suppkey"), p)
  }

  test("embedding top-k pairs is a block equi-join, not a cartesian") {
    val p = planOf("dedup_embedding_cos")
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$p")
    // the trailing top-20 must collapse to per-partition top-k
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n$p")
  }

  test("ivf probed-cell scan is partition-pruned") {
    val p = planOf("ann_ivf_topk")
    assert(p.contains("PartitionFilters: [cell"),
      s"probed-cell filter not pushed to partition pruning:\n$p")
  }

  test("whole-stage codegen covers the q1 aggregate") {
    val df = SparkEntry.queries("tpch_q1")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    // '*(n)' marks WholeStageCodegen spans in the finalized plan
    assert(p.contains("*("), s"q1 not codegen'd:\n$p")
  }
}
