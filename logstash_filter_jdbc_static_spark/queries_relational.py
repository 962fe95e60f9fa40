"""Relational query shapes from SURVEY 2B (projection/aliases, equi
joins, conjunctive predicates, ORDER BY, COUNT, top-k, windows) shown on
the TPC-H-ish driver tables, each with a DuckDB oracle.

Double-typed aggregates are rounded to 2 decimals in BOTH engines:
inputs carry exactly 2 decimals, so the true sum is never on a rounding
boundary and HALF_UP/HALF_EVEN agree; the round only absorbs summation-
order FP noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from logstash_filter_jdbc_static_spark.queries import register

# ------------------------------------------------- TPC-H Q1-style agg

_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("relational_agg_pricing", _AGG_SQL)
def relational_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -------------------------------------- multi-join with projections

_JOIN_SQL = """
SELECT n.n_name AS nation, r.r_name AS region,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderstatus <> 'F'
GROUP BY 1, 2
"""


@register("relational_join_nation_region", _JOIN_SQL)
def relational_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: small dims broadcast, single shuffle on the final
    (tiny) group key — the 100 TB plan for fact-to-dim chains."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ------------------------------------------------------ top-k (sorted)

_TOPK_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY orders.o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("relational_topk_orders", _TOPK_SQL)
def relational_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heap then
    k-way merge on the driver; no full sort, no full shuffle."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .limit(20)
    )


# ------------------------------------------------------------ window

_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
"""


@register("relational_window_running", _WINDOW_SQL)
def relational_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("order_seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_spend"),
    )


# ------------------------------------------ events sessionization-ish

# avg(value) rounded to 2dp can land exactly on a .xx5 boundary (inputs
# are 2-decimal), where Spark HALF_UP and DuckDB HALF_EVEN disagree.
# Instead: recover the exact integer cents (sum*100 rounds to the same
# integer in both engines), then do the identical IEEE divisions — no
# rounding anywhere.
_EVENTS_SQL = """
SELECT user_id, event_type,
       count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) / 100.0 AS total_value,
       (CAST(round(sum(value) * 100) AS BIGINT) / 100.0) / count(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


@register("events_rollup", _EVENTS_SQL)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.sum("value") * 100, 0).cast("long")
    return e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (cents / 100.0).alias("total_value"),
        ((cents / 100.0) / F.count(F.lit(1))).alias("avg_value"),
    )
