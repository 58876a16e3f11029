"""Filter/projection operators (SURVEY §2.2 P1–P14).

The reference's predicates are lexical date-string compares (M:643),
char-position month tests (M:1014), regex id filters (豆瓣图书推荐.md:33),
computed-difference outlier drills (M:1232) and IN-list OR-chains
(M:551). On proper types these all push down to the parquet scan
(min/max row-group skipping) — checked in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fixed_sum, round_to, sql_fixed_sum
from ..plans.registry import query
from ..sources import load


@query(
    "filter_date_range",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
       CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS big_flag
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND o_orderstatus IN ('O', 'F')
  AND o_totalprice > 1000
""",
    tags=("P3", "P4", "P9", "P11"),
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 date-range + P9 IN-list + P11 conditional flag (M:643-644,
    M:551, M:75-77). With DateType instead of the reference's yyyyMMdd
    strings, the range predicate prunes parquet row groups."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
        & F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_totalprice") > 1000)
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.when(F.col("o_totalprice") > 100000, 1).otherwise(0).alias("big_flag"),
    )


@query(
    "filter_month_of_date",
    oracle=f"""
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
       COUNT(*) AS n_items,
       {sql_fixed_sum('l_extendedprice', 2, 2)} AS sum_price
FROM lineitem
WHERE month(l_shipdate) < 7 AND year(l_shipdate) = 1997
GROUP BY 1
""",
    tags=("P5",),
)
def filter_month_of_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (M:1014): the reference tests month by string char position
    (charAt(5) < '7'); on typed dates it is month() < 7 — visible to
    Catalyst and foldable."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.month("l_shipdate") < 7) & (F.year("l_shipdate") == 1997))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.count("*").alias("n_items"),
            fixed_sum(F.col("l_extendedprice"), 2, 2).alias("sum_price"),
        )
    )


@query(
    "filter_regex_extract",
    oracle="""
WITH parsed AS (
  SELECT event_id, user_id,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
  FROM events
  WHERE regexp_matches(props, '^\\{"k": [0-9]+\\}$')
)
SELECT k, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM parsed
WHERE k % 10 = 0
GROUP BY k
""",
    tags=("P7", "F15", "F12"),
)
def filter_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F15 (豆瓣图书推荐.md:33): regex-validate then extract a numeric
    field from a semi-structured string column (the props JSON blob)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.filter(F.col("props").rlike(r'^\{"k": [0-9]+\}$')).select(
        "event_id",
        "user_id",
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("int").alias("k"),
    )
    return (
        parsed.filter(F.col("k") % 10 == 0)
        .groupBy("k")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "filter_computed_outliers",
    oracle="""
SELECT l.l_orderkey, l.l_partkey,
       (floor((l.l_extendedprice - p.p_retailprice) * 100.0 + 0.5) / 100.0) AS price_gap
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_extendedprice IS NOT NULL
  AND (l.l_extendedprice - p.p_retailprice) > 20000
""",
    tags=("P8", "P10"),
)
def filter_computed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P10 (M:1232): outlier drill-down — filter on a computed
    difference (label - prediction > 500 in the reference) plus the
    null-guard."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    gap = F.col("l_extendedprice") - F.col("p_retailprice")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("l_extendedprice").isNotNull() & (gap > 20000))
        .select("l_orderkey", "l_partkey", round_to(gap, 2).alias("price_gap"))
    )
