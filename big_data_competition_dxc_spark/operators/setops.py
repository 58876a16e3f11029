"""Set operations (SURVEY §2.7 U1–U4).

unionAll of per-cluster predictions (流行音乐趋势预测.md:1217),
intersection of recommended-vs-read (豆瓣图书推荐.md:97), prose
except (D:21), and train/test splits (D:51 randomSplit; M:643-644
date-based)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load


@query(
    "union_segments",
    oracle="""
SELECT event_id, user_id, 'big_purchase' AS segment
FROM events WHERE event_type = 'purchase' AND value > 10
UNION ALL
SELECT event_id, user_id, 'error' AS segment
FROM events WHERE event_type = 'error'
""",
    tags=("U1",),
)
def union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (M:1217): unionByName of tagged sub-frames (the per-cluster
    prediction union shape)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 10)).select(
        "event_id", "user_id", F.lit("big_purchase").alias("segment")
    )
    b = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.lit("error").alias("segment")
    )
    return a.unionByName(b)


@query(
    "intersect_buyers_clickers",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
""",
    tags=("U2",),
)
def intersect_buyers_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (豆瓣图书推荐.md:97): set intersection — recommended∩read becomes
    clickers∩buyers."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


@query(
    "except_no_error_users",
    oracle="""
SELECT DISTINCT user_id FROM events
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
""",
    tags=("U3",),
)
def except_no_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 (豆瓣图书推荐.md:21): set difference — users who never errored."""
    ev = load(spark, sf_dir, "events")
    all_users = ev.select("user_id").distinct()
    err_users = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return all_users.subtract(err_users)


@query(
    "deterministic_split_6040",
    oracle="""
SELECT CASE WHEN event_id % 10 < 6 THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
""",
    tags=("U4",),
)
def deterministic_split_6040(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 (豆瓣图书推荐.md:51): 60/40 train/test split. randomSplit is not
    reproducible across engines, so the oracle-checked form keys the
    split on event_id % 10 — the date-based split (M:643-644) is the
    same idea. Seeded randomSplit itself ships in ml.recommend."""
    ev = load(spark, sf_dir, "events")
    split = F.when(F.col("event_id") % 10 < 6, "train").otherwise("test")
    return (
        ev.withColumn("split", split)
        .groupBy("split")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "dedup_distinct_events",
    oracle="""
SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS ds
FROM events
""",
    tags=("A7",),
)
def dedup_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (M:42): SELECT DISTINCT dedup before joining — the reference's
    data-cleaning first step."""
    ev = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type", F.to_date("ts").alias("ds")).distinct()


@query(
    "setops_bag_semantics",
    oracle="""
WITH a AS (SELECT user_id FROM events WHERE event_type = 'view'),
b AS (SELECT user_id FROM events WHERE event_type = 'click'),
ex AS (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b),
ia AS (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b)
SELECT 'except_all' AS op, user_id, COUNT(*) AS n FROM ex GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, user_id, COUNT(*) FROM ia GROUP BY 2
""",
    tags=("U2", "U3"),
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the multiplicity-preserving
    variants U2/U3's DISTINCT forms can't express: per user,
    views-minus-clicks keeps count_views - count_clicks copies and the
    intersection keeps min(count_views, count_clicks). Summarized per
    (op, user) so bag semantics are visible as counts. Spark plans both
    as a single aggregate computing per-key multiplicities then a
    generator replicating rows (no join) — one shuffle each, same as
    the relational textbook form."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    ex = (
        a.exceptAll(b)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "user_id", "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "user_id", "n")
    )
    return ex.unionByName(ia)
