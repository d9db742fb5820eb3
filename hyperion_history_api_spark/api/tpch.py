"""Analytical headline queries over the star schema (bench backbone).

Hyperion has no general joins/rollups (ES does the lookups); Spark
gets them natively. These exercise the physical shapes that dominate
at 100 TB: partial+final hash aggregation (Q1), broadcast-dim join
chains with selective pushed filters (Q3/Q5-ish), and top-K merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..registry import register, _t


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "flagship scan+agg (A4/A5 shape at TPC-H Q1 semantics)",
    headline=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full-scan partial+final hash agg; ship-date filter and
    7-column projection push into the parquet scan."""
    li = _t(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2024-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '2024-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    "join chain + agg + top-K (Q3 semantics)",
    headline=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is the small filtered side -> broadcast both hops so the
    fact table never shuffles before aggregation."""
    t = _t(spark, sf_dir)
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(
        F.col("o_orderdate") < F.lit("2024-06-30 00:00:00").cast("timestamp")
    )
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("2024-06-30 00:00:00").cast("timestamp")
    )
    return (
        li.join(broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_region_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name ASC
    """,
    "multi-way broadcast join + agg (Q5 semantics)",
    headline=True,
)
def tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dims (region/nation/supplier) broadcast; lineitem⋈orders⋈customer
    are the big-big joins left to shuffle-hash/sort-merge — AQE picks
    per-side at runtime. This is the plan that survives 100 TB: the
    fact table shuffles once per big join key, never broadcasts."""
    t = _t(spark, sf_dir)
    nr = (
        t["nation"]
        .join(broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = t["supplier"].join(
        broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]
    return (
        li.join(broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders.select("o_orderkey", "o_custkey"),
              li["l_orderkey"] == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "order_priority_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "A7 terms+sub-agg on state table",
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir)["orders"]
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy("o_orderpriority", "o_orderstatus")
    )
