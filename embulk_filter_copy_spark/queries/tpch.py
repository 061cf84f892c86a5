"""Standard OLAP coverage over the TPC-H-ish tables: each SURVEY.md §2
category the engine generalizes (joins of every shape, aggregations, windows,
sorts/top-k, set ops, scalar/json functions) gets a representative query with
a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from embulk_filter_copy_spark.queries.common import reps, t


# --------------------------------------------------------------------- Q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            reps(F.sum("l_quantity"), 2).alias("sum_qty"),
            reps(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            reps(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            reps(F.avg("l_quantity"), 4).alias("avg_qty"),
            reps(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
       round(sum(l_extendedprice) + 1e-9, 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS sum_disc_price,
       round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
       round(avg(l_discount) + 1e-9, 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- Q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(reps(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# --------------------------------------------------------------------- Q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(reps(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


# ------------------------------------------------------------- join shapes
def join_broadcast_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), reps(F.sum("o_totalprice"), 2).alias("total"))
    )


JOIN_BROADCAST_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice) + 1e-9, 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


JOIN_SEMI_SQL = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


JOIN_ANTI_SQL = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


# ------------------------------------------------------------- windows
def window_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


WINDOW_TOPK_SQL = """
SELECT c_mktsegment, rank, o_orderkey, round(o_totalprice, 2) AS price
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 3
"""


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        reps(F.sum("l_extendedprice").over(w), 2).alias("running_revenue"),
    )


WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 2) AS running_revenue
FROM lineitem WHERE l_suppkey <= 20
"""


# ------------------------------------------------------------- rollup / sets
def agg_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), reps(F.sum("l_quantity"), 2).alias("sum_qty")
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity) + 1e-9, 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def set_ops_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    big = p.filter(F.col("p_size") > 40).select("p_brand").distinct()
    pricey = p.filter(F.col("p_retailprice") > 1500).select("p_brand").distinct()
    both = big.intersect(pricey).withColumn("tag", F.lit("both"))
    only_big = big.exceptAll(pricey).withColumn("tag", F.lit("only_big"))
    return both.unionByName(only_big)


SET_OPS_SQL = """
WITH big AS (SELECT DISTINCT p_brand FROM part WHERE p_size > 40),
     pricey AS (SELECT DISTINCT p_brand FROM part WHERE p_retailprice > 1500)
SELECT p_brand, 'both' AS tag FROM (SELECT * FROM big INTERSECT SELECT * FROM pricey)
UNION ALL
SELECT p_brand, 'only_big' AS tag FROM (SELECT * FROM big EXCEPT SELECT * FROM pricey)
"""


def global_topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return (
        l.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


GLOBAL_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
"""


# ------------------------------------------------------------- scalar / json
def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("bucket"),
        F.length("o_orderpriority").alias("prio_len"),
        F.sha2(F.col("o_orderpriority"), 256).alias("prio_sha"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderstatus, 1, 1) AS status_c,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       round(sqrt(o_totalprice), 4) AS sqrt_price,
       o_orderkey % 7 AS key_mod,
       concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
       CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
       CAST(length(o_orderpriority) AS INT) AS prio_len,
       sha256(o_orderpriority) AS prio_sha
FROM orders WHERE o_orderkey <= 2000
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), reps(F.avg("value"), 4).alias("avg_value"))
    )


JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS n, round(avg(value) + 1e-9, 4) AS avg_value
FROM events GROUP BY 1
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "join_broadcast_segment": (join_broadcast_segment, JOIN_BROADCAST_SQL),
    "join_semi_customers_with_orders": (join_semi_customers_with_orders, JOIN_SEMI_SQL),
    "join_anti_customers_without_orders": (join_anti_customers_without_orders, JOIN_ANTI_SQL),
    "window_topk_orders_per_segment": (window_topk_orders_per_segment, WINDOW_TOPK_SQL),
    "window_running_revenue": (window_running_revenue, WINDOW_RUNNING_SQL),
    "agg_rollup_flags": (agg_rollup_flags, AGG_ROLLUP_SQL),
    "set_ops_brands": (set_ops_brands, SET_OPS_SQL),
    "global_topk_lineitems": (global_topk_lineitems, GLOBAL_TOPK_SQL),
    "scalar_battery": (scalar_battery, SCALAR_SQL),
    "json_extract_props": (json_extract_props, JSON_SQL),
}
