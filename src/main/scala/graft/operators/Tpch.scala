package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** TPC-H query corpus — the reference's end-to-end surface.
  *
  * The reference ships `rust/benchmarks/tpch/queries/q{1..22}.sql` (q15
  * absent) and its CI integration set runs {1,3,5,6,10,12}
  * (reference: rust/benchmarks/tpch/run.sh:6). Per SURVEY.md §2.8 we
  * implement the full 22 — Spark SQL handles the subqueries the reference
  * never exercised distributed.
  *
  * Queries are adapted to the driver fixture schema (TESTDATA.md), which
  * omits `partsupp` and several columns (comments, ship modes,
  * commit/receipt dates, addresses/phones); adapted queries keep the
  * original operator shape (join graph, agg pattern, subquery structure) on
  * the available columns. Each adaptation is noted inline.
  *
  * Oracle-parity conventions (same SQL text runs on Spark and DuckDB):
  *  - money/decimal aggregates: `CAST(SUM(CAST(expr AS DECIMAL(18,s))) AS
  *    DOUBLE)` — decimal summation is order-independent, so the parallel
  *    Spark aggregate and the sequential DuckDB one agree bit-for-bit.
  *    Source values carry ≤2 decimals, products ≤4/≤6, so the inner casts
  *    are lossless (no rounding-mode divergence).
  *  - integer-count sums: `COUNT(...)`/`CAST(SUM(..) AS BIGINT)` (DuckDB's
  *    SUM(int) is HUGEINT).
  *  - `year()` wrapped in CAST(.. AS INT) (DuckDB returns BIGINT).
  *  - every ORDER BY ends in a unique key so LIMIT sets are deterministic.
  */
object Tpch {

  /** disc_price / charge building blocks (lossless decimal forms). */
  private val Rev = "CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))"

  val sql: Map[String, String] = Map(
    // q1 — pricing summary report (reference: rust/benchmarks/tpch/queries/q1.sql)
    "tpch_q1" -> s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM($Rev) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // q2 — adapted (no partsupp): min-acctbal supplier per part via the
    // lineitem part↔supplier link; keeps the correlated-MIN-subquery shape
    // of rust/benchmarks/tpch/queries/q2.sql.
    "tpch_q2" -> """
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      FROM part, supplier, lineitem, nation, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_size = 15 AND p_type LIKE '%STANDARD%'
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM supplier s2, lineitem l2, nation n2, region r2
          WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
      GROUP BY s_acctbal, s_name, n_name, p_partkey, p_type
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    // q3 — shipping priority, minus the absent o_shippriority column.
    "tpch_q3" -> s"""
      SELECT l_orderkey,
        CAST(SUM($Rev) AS DOUBLE) AS revenue,
        o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10""",

    // q4 — order priority checking; EXISTS predicate adapted from the
    // absent commit/receipt dates to returned lineitems.
    "tpch_q4" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // q5 — local supplier volume (reference integration set).
    "tpch_q5" -> s"""
      SELECT n_name,
        CAST(SUM($Rev) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    // q6 — forecasting revenue change (reference integration set).
    "tpch_q6" -> """
      SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",

    // q7 — volume shipping between two nations (self-join of nation).
    "tpch_q7" -> s"""
      SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               $Rev AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      ) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""",

    // q8 — national market share.
    "tpch_q8" -> s"""
      SELECT o_year,
        CAST(SUM(CASE WHEN nationn = 'NATION_3' THEN volume
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               $Rev AS volume,
               n2.n_name AS nationn
        FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND p_type = 'ECONOMY'
      ) all_nations
      GROUP BY o_year
      ORDER BY o_year""",

    // q9 — product type profit, adapted: no ps_supplycost, so "profit" is
    // discounted revenue; part filter on the fixture's adjective-noun names.
    "tpch_q9" -> s"""
      SELECT nationn AS nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nationn, CAST(year(o_orderdate) AS INT) AS o_year,
               $Rev AS amount
        FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
      ) profit
      GROUP BY nationn, o_year
      ORDER BY nationn, o_year DESC""",

    // q10 — returned item reporting (reference integration set), minus the
    // absent address/phone/comment columns.
    "tpch_q10" -> s"""
      SELECT c_custkey, c_name,
        CAST(SUM($Rev) AS DOUBLE) AS revenue,
        c_acctbal, n_name
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    // q11 — important stock identification, adapted: partsupp value replaced
    // by lineitem revenue per part for one nation's suppliers; keeps the
    // HAVING-over-scalar-subquery shape.
    "tpch_q11" -> """
      SELECT l_partkey AS ps_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_0'
      GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.0008
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_0')
      ORDER BY part_value DESC, ps_partkey""",

    // q12 — shipping modes & priority, adapted: no l_shipmode/commit/receipt
    // dates; keeps the CASE-counting shape grouped on l_linestatus.
    "tpch_q12" -> """
      SELECT l_linestatus,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                   THEN 1 END) AS high_line_count,
        COUNT(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                   THEN 1 END) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",

    // q13 — customer distribution (left join + double grouping); the
    // o_comment NOT LIKE filter is adapted to an order-priority filter.
    "tpch_q13" -> """
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    // q14 — promotion effect.
    "tpch_q14" -> s"""
      SELECT CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $Rev
                                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM($Rev) AS DOUBLE) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",

    // q15 — top supplier (absent from the reference's query dir; SURVEY §2.8)
    // expressed with a CTE in place of the CREATE VIEW.
    "tpch_q15" -> s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM($Rev) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""",

    // q16 — parts/supplier relationship, adapted: the partsupp link is the
    // lineitem part↔supplier co-occurrence; keeps COUNT(DISTINCT) + NOT IN.
    "tpch_q16" -> """
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    // q17 — small-quantity-order revenue (correlated AVG subquery; exact
    // across engines because l_quantity is integer-valued).
    "tpch_q17" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",

    // q18 — large volume customers. Written as the pre-aggregated form:
    // o_orderkey functionally determines every other group key, so
    // grouping lineitem alone first (HAVING included) is EXACTLY the
    // spec query — and it is the scale-correct plan: the fact table
    // collapses to per-order sums BEFORE any join (one skinny-key
    // shuffle with map-side partials), the very selective HAVING then
    // leaves a dim-sized row set to join. The joined-first formulation
    // let AQE broadcast the 2-column lineitem projection at sf0.1 —
    // cute at 10 MB, fatal at SF1000. (The DuckDB oracle keeps the
    // joined-first spec shape, so parity also proves the rewrite.)
    "tpch_q18" -> """
      WITH lq AS (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dec_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(dec_qty AS DOUBLE) AS sum_qty
      FROM lq
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""",

    // q19 — discounted revenue, adapted: p_container/l_shipmode absent, OR-
    // of-ANDs over brand/size/quantity ranges keeps the disjunctive shape.
    "tpch_q19" -> s"""
      SELECT CAST(SUM($Rev) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",

    // q20 — potential part promotion, adapted: the partsupp/availqty
    // subquery becomes an IN-subquery over shipped parts.
    "tpch_q20" -> """
      SELECT s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5' AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
      ORDER BY s_name""",

    // q21 — suppliers who kept orders waiting, adapted: the commit/receipt
    // lateness predicate becomes returnflag='R'; keeps EXISTS + NOT EXISTS.
    "tpch_q21" -> """
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        AND n_name = 'NATION_2'
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",

    // q22 — global sales opportunity, adapted: country code from
    // c_nationkey (no c_phone); keeps scalar-avg subquery + NOT EXISTS.
    "tpch_q22" -> """
      SELECT cntrycode, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM (
        SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_nationkey IN (0,1,2,3,4,5,6,7,8,9)
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0 AND c_nationkey IN (0,1,2,3,4,5,6,7,8,9))
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
      ) custsale
      GROUP BY cntrycode
      ORDER BY cntrycode"""
  ).map { case (k, v) => k -> v.stripMargin.trim }

  /** Driver-contract query map: register fixture views, run the shared SQL. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, q) =>
      name -> ((spark: SparkSession, dir: String) => {
        Tables.registerTpch(spark, dir)
        spark.sql(q)
      })
    }

  /** The oracle is the identical SQL text (dialect-shared subset), except
    * where the Spark side carries a scale rewrite — there the oracle keeps
    * the UN-rewritten spec shape, so parity also proves the rewrite's
    * equivalence.
    */
  val oracles: Map[String, String] = sql ++ Map(
    // joined-first q18 as specified (the Spark side pre-aggregates
    // lineitem; see the rewrite note on the query)
    "tpch_q18" -> """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      HAVING SUM(l_quantity) > 150
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""".stripMargin.trim)
}
