package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PlanSerde, PlanSerdeException}
import graft.plans.PlanSerde._

/** The repo's analog of the reference's plan-serde unit layer
  * (rust/core/src/serde/logical_plan/mod.rs `roundtrip_test!`): every
  * test asserts `fromJson(toJson(w)) == w` plus, for executable plans,
  * that the deserialized plan computes the SAME ROWS as the plan that
  * entered the wire.
  */
class PlanSerdeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertTrip(df: org.apache.spark.sql.DataFrame): Unit = {
    val wire = PlanSerde.fromLogical(df.queryExecution.analyzed)
    val json = PlanSerde.toJson(wire)
    assert(PlanSerde.fromJson(json) == wire, "ADT round-trip")
    assert(PlanSerde.toJson(PlanSerde.fromJson(json)) == json, "JSON fixpoint")
    assert(rows(PlanSerde.compile(spark, sfDir, PlanSerde.fromJson(json)))
      == rows(df), "deserialized plan must compute the same rows")
  }

  test("scan/filter/project round-trips with identical results") {
    assertTrip(Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") < 10.0 && col("l_returnflag") === "A")
      .select(col("l_orderkey"), (col("l_extendedprice") * col("l_tax"))
        .as("taxed")))
  }

  test("grouped aggregate with distinct + sort + limit round-trips") {
    assertTrip(Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        avg(col("l_discount")).as("mean_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linestatus").desc)
      .limit(3))
  }

  test("equi-join round-trips; timestamp literal survives the wire") {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    assertTrip(o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("c_name")))
  }

  test("sql-entered plan round-trips (BETWEEN desugars onto the wire)") {
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("li_serde_t")
    assertTrip(spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM li_serde_t
         WHERE l_discount BETWEEN 0.05 AND 0.07 GROUP BY l_returnflag"""))
  }

  test("repartition round-trips, round-robin and hash (ref mod.rs:58)") {
    assertTrip(Tables.load(spark, sfDir, "nation").repartition(4))
    assertTrip(Tables.load(spark, sfDir, "nation")
      .repartition(4, col("n_regionkey")))
  }

  test("literal projection over one-row relation round-trips, null and " +
      "date scalars included (ref mod.rs:746, :123-586)") {
    assertTrip(spark.sql(
      """SELECT 1 AS one, 'x' AS s, CAST(NULL AS DOUBLE) AS d,
                DATE '2024-05-17' AS dt, true AS b"""))
  }

  test("wire json is stable and human-auditable") {
    val w = WSelection(WScan("lineitem"),
      WBinary("lt", WCol("l_quantity"), WLit("double", "24.0")))
    assert(PlanSerde.toJson(w) ==
      """{"node":"selection","input":{"node":"scan","table":"lineitem"},""" +
      """"predicate":{"expr":"binary","op":"lt",""" +
      """"left":{"expr":"col","name":"l_quantity"},""" +
      """"right":{"expr":"lit","type":"double","value":"24.0"}}}""")
  }

  test("unsupported nodes fail with a named error, not silently") {
    val win = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey")))
        .as("rn"))
    val e = intercept[PlanSerdeException] {
      PlanSerde.fromLogical(win.queryExecution.analyzed)
    }
    assert(e.getMessage.contains("unsupported"))
    val e2 = intercept[PlanSerdeException] {
      PlanSerde.fromJson("""{"node":"flight_shuffle"}""")
    }
    assert(e2.getMessage.contains("flight_shuffle"))
  }

  test("malformed wire json fails parse, not compile") {
    intercept[PlanSerdeException] {
      PlanSerde.fromJson("""{"node":"limit","input":{"node":"scan",
        "table":"orders"},"n":"not_a_number"}""")
    }
  }
}
