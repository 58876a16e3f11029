"""Array (collection) function surface — the set-algebra the reference
performs with driver-side Scala collections (its per-user song-set
manipulations) expressed as JVM array expressions over grouped data.

Every derived array is passed through sort (and the concat through
distinct) before leaving the query: Spark's array_intersect/except
preserve probe-side encounter order while DuckDB's list_filter keeps
list order — sorting canonicalizes both to the same value, the same
discipline as array_agg_user_types. All operations are per-row over
already-aggregated vocabulary-sized arrays: no extra shuffle beyond
the one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

REF_TYPES = ("click", "purchase", "view")

_REF_SQL = "['click', 'purchase', 'view']"

_ARRAY_ORACLE = f"""
WITH base AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       types,
       list_sort(list_filter(types, x -> list_contains({_REF_SQL}, x)))
         AS inter_ref,
       list_sort(list_filter(types, x -> NOT list_contains({_REF_SQL}, x)))
         AS beyond_ref,
       list_sort(list_distinct(list_concat(types, {_REF_SQL}))) AS union_ref,
       CAST(list_contains(types, 'purchase') AS INT) AS has_purchase,
       types[1:2] AS first_two,
       CAST(len(types) AS INT) AS n_types
FROM base
"""


@query(
    "array_functions_suite",
    oracle=_ARRAY_ORACLE,
    tags=("F12", "array", "functions"),
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the sorted distinct event-type vocabulary and its
    set algebra against a reference list — intersect, except, union,
    contains, slice, size — all as built-in array expressions."""
    ref = F.array(*[F.lit(t) for t in REF_TYPES])
    base = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.array_sort(F.array_distinct(F.collect_list("event_type"))).alias("types"))
    )
    return base.select(
        "user_id",
        "types",
        F.array_sort(F.array_intersect("types", ref)).alias("inter_ref"),
        F.array_sort(F.array_except("types", ref)).alias("beyond_ref"),
        F.array_sort(F.array_distinct(F.concat("types", ref))).alias("union_ref"),
        F.array_contains("types", "purchase").cast("int").alias("has_purchase"),
        F.slice("types", 1, 2).alias("first_two"),
        F.size("types").alias("n_types"),
    )


_POSEXPLODE_ORACLE = """
WITH base AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       CAST(unnest(range(0, len(types))) AS INT) AS pos,
       unnest(types) AS event_type
FROM base
"""


@query(
    "posexplode_user_types",
    oracle=_POSEXPLODE_ORACLE,
    tags=("F12", "array", "functions"),
)
def posexplode_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — the ordinal-preserving inverse of array
    aggregation: each user's sorted type vocabulary back to
    (user_id, position, element) rows. Positions come from the array
    structure itself (0-based), not a window, so re-exploding a stored
    array column never needs a sort. Narrow after the one groupBy."""
    base = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("event_type"))).alias("types")
        )
    )
    return base.select(
        "user_id", F.posexplode("types").alias("pos", "event_type")
    )
