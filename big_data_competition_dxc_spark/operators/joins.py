"""Join operators (SURVEY §2.3 J1–J6, J8).

The reference's joins are fact⟕dim SQL joins (流行音乐趋势预测.md:45),
composite-key API joins (M:92-94, M:293), implicit theta joins via WHERE
(M:97), chained snowflakes (M:989-993), RDD pair joins (豆瓣图书推荐.md:75-77)
and a prose anti-join (D:21). Here each is declarative DataFrame/SQL so
Catalyst picks the physical strategy; small dimensions get an explicit
``F.broadcast`` hint (at 100 TB the fact side never moves for dim joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fixed_avg, fixed_sum, sql_fixed_avg, sql_fixed_sum
from ..plans.registry import query
from ..sources import load, register_views


@query(
    "join_left_broadcast",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    tags=("J1",),
)
def join_left_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (M:45): fact LEFT JOIN small dim — broadcast-hash, no fact shuffle."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "join_snowflake_rollup",
    oracle=f"""
SELECT r.r_name, n.n_name,
       {sql_fixed_sum('o.o_totalprice', 2, 2)} AS revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    bench=True,
    tags=("J4", "A4"),
)
def join_snowflake_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (M:989-993): chained multi-join snowflake -> rollup. The two tiny
    dims broadcast; orders⋈customer is the only shuffle pair, and AQE can
    still flip it to broadcast when customer fits."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            fixed_sum(F.col("o_totalprice"), 2, 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_THETA_SQL = f"""
SELECT p.p_brand AS brand,
       COUNT(*) AS n_items,
       {sql_fixed_sum('l.l_quantity', 0, 2)} AS sum_qty
FROM lineitem l, part p
WHERE l.l_partkey = p.p_partkey AND p.p_size > 30
GROUP BY p.p_brand
"""


@query("join_theta_sql", oracle=_THETA_SQL, tags=("J3", "P2", "S5"))
def join_theta_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (M:97): implicit-cross-plus-WHERE join written as raw SQL on temp
    views — Catalyst extracts the equi-keys from the conjunction, same as
    the reference relied on. Identical text runs on DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_THETA_SQL)


@query(
    "join_anti_unsold_parts",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
""",
    tags=("J8", "U3"),
)
def join_anti_unsold_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (豆瓣图书推荐.md:21): 'exclude already-rated' as a left-anti join —
    here: parts that never appear in lineitem."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, part.p_partkey == lineitem.l_partkey, "left_anti"
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "mse_join_eval",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id % 50 AS item_id, value FROM events
),
labels AS (
  SELECT user_id, item_id, {avg4} AS rating
  FROM ev GROUP BY user_id, item_id
),
preds AS (
  SELECT item_id, {avg4} AS pred FROM ev GROUP BY item_id
)
SELECT l.user_id,
       COUNT(*) AS n_items,
       {mse8} AS mse
FROM labels l JOIN preds p ON l.item_id = p.item_id
GROUP BY l.user_id
""".format(
        avg4=sql_fixed_avg("value", 2, 4),
        # rating/pred are floor-quotients on a 4dp grid, so the squared
        # difference sits on an 8dp grid — exact at dec=8
        mse8=sql_fixed_avg("POW(l.rating - p.pred, 2)", 8, 4),
    ),
    tags=("J6", "A10", "F17"),
)
def mse_join_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+A10 (豆瓣图书推荐.md:75-81): the ratesAndPreds pattern — join
    labels to predictions on a composite key, then mean squared error
    (F17 math.pow, M:377-381) per user."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.pmod("event_id", F.lit(50)).alias("item_id"), "value"
    )
    labels = ev.groupBy("user_id", "item_id").agg(fixed_avg(F.col("value"), 2, 4).alias("rating"))
    preds = ev.groupBy("item_id").agg(fixed_avg(F.col("value"), 2, 4).alias("pred"))
    return (
        labels.join(preds, "item_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_items"),
            fixed_avg(F.pow(F.col("rating") - F.col("pred"), 2), 8, 4).alias("mse"),
        )
    )
