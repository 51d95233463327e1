#!/usr/bin/env python3
"""PySpark client walkthrough for the graft library — the analog of the
reference's Python binding example (python/examples/testquery.py, which
registers the TPC-H tables against a BallistaContext and runs the CI
query set). Where the reference had to hand-build a Python binding over
Flight, Spark already ships one: plain PySpark against a session with
the graft extensions installed sees every operator, SQL construct, and
registered native function in this library.

Run (needs a PySpark matching the Spark version on the classpath; this
repo's sandbox intentionally has no Python-side Spark — the JVM twin of
this script is `sbt "runMain graft.Demo <sf_dir>"`):

    spark-submit \
      --jars graft.jar \
      --conf spark.sql.extensions=graft.functions.GraftExtensions \
      examples/pyspark_client.py /root/testdata/sf0.001

Or, against a pip-installed PySpark (its bundled Spark launches the JVM),
point GRAFT_CLASSES at the compiled library and run the script directly:

    GRAFT_CLASSES=target/scala-2.13/classes \
      python3 examples/pyspark_client.py /root/testdata/sf0.001

`PySparkClientSpec` runs exactly that as a conditional CI step — green
where a matching PySpark exists, a documented skip otherwise.
"""
import os
import sys

from pyspark.sql import SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the reference's CI integration set (rust/benchmarks/tpch/run.sh:6)
QUERIES = {
    "q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
    "q6": """
        SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""",
    # a graft native function (codegen'd Catalyst expression), visible to
    # Python because GraftExtensions injects it into the SQL registry
    "native_fns": """
        SELECT doc_id, word_shingles(split(lower(text), ' '), 3) AS shingles,
               greedy_token_count(lower(text)) AS n_subword_tokens
        FROM documents ORDER BY doc_id LIMIT 5""",
}


def main(sf_dir: str) -> None:
    builder = (SparkSession.builder
               .appName("graft-pyspark-client")
               .config("spark.sql.extensions", "graft.functions.GraftExtensions")
               .config("spark.sql.shuffle.partitions", "32")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.sql.legacy.parquet.nanosAsLong", "true")
               .config("spark.ui.enabled", "false"))
    # spark-submit --jars puts the library on the classpath itself; a
    # direct `python3` launch passes it via GRAFT_CLASSES instead
    classes = os.environ.get("GRAFT_CLASSES")
    if classes:
        builder = builder.config("spark.driver.extraClassPath",
                                 os.path.abspath(classes))
    spark = builder.getOrCreate()

    # ctx.register_table() of the reference == temp views here
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)

    for name, sql in QUERIES.items():
        df = spark.sql(sql)
        df.explain()
        rows = df.collect()
        print(f"=== {name}: {len(rows)} rows; first 5:")
        for r in rows[:5]:
            print("   ", r)

    # the DataFrame API surface maps 1:1 (reference python/src/dataframe.rs)
    li = spark.table("lineitem")
    agg = (li.filter(li.l_quantity < 24)
             .groupBy("l_returnflag").count()
             .orderBy("l_returnflag"))
    print("=== dataframe api:", agg.collect())

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
