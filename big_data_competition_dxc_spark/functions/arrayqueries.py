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
       array_to_string(types, ',') AS types,
       array_to_string(list_sort(list_filter(types, x -> list_contains({_REF_SQL}, x))), ',')
         AS inter_ref,
       array_to_string(list_sort(list_filter(types, x -> NOT list_contains({_REF_SQL}, x))), ',')
         AS beyond_ref,
       array_to_string(list_sort(list_distinct(list_concat(types, {_REF_SQL}))), ',')
         AS union_ref,
       CAST(list_contains(types, 'purchase') AS INT) AS has_purchase,
       array_to_string(types[1:2], ',') AS first_two,
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
    contains, slice, size — all as built-in array expressions. Derived
    arrays leave the query as comma-joined strings (elements contain no
    commas): top-level array columns break the driver's pandas
    canonicalizer, so the query surface stays scalar-only."""
    ref = F.array(*[F.lit(t) for t in REF_TYPES])
    joined = lambda c: F.concat_ws(",", c)  # noqa: E731
    base = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.array_sort(F.array_distinct(F.collect_list("event_type"))).alias("types"))
    )
    return base.select(
        "user_id",
        joined(F.col("types")).alias("types"),
        joined(F.array_sort(F.array_intersect("types", ref))).alias("inter_ref"),
        joined(F.array_sort(F.array_except("types", ref))).alias("beyond_ref"),
        joined(F.array_sort(F.array_distinct(F.concat("types", ref)))).alias(
            "union_ref"
        ),
        F.array_contains("types", "purchase").cast("int").alias("has_purchase"),
        joined(F.slice("types", 1, 2)).alias("first_two"),
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


from ..functions.rounding import sql_fixed_sum

_NULL_SEMANTICS_ORACLE = f"""
WITH readings AS (
  SELECT event_type,
         CASE WHEN event_type <> 'error' THEN value END AS reading
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(reading) AS BIGINT) AS n_gaps,
       CAST(COUNT(*) FILTER (WHERE reading IS NOT DISTINCT FROM NULL) AS BIGINT)
         AS n_nullsafe_null,
       {sql_fixed_sum("COALESCE(reading, 0.0)", 2, 2)} AS filled_sum
FROM readings
GROUP BY event_type
"""


@query(
    "null_semantics_suite",
    oracle=_NULL_SEMANTICS_ORACLE,
    tags=("P10", "P13", "functions"),
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-algebra surface in one query: three-valued COUNT
    behavior, null-safe equality (<=> / IS NOT DISTINCT FROM), and
    COALESCE fill — the semantics data-quality filters depend on.
    error events carry no reading; every measure is integer or exact
    cents, so the hash compare is exact."""
    ev = load(spark, sf_dir, "events")
    reading = F.when(F.col("event_type") != "error", F.col("value"))
    from ..functions.rounding import fixed_sum

    return (
        ev.select("event_type", reading.alias("reading"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count("reading")).cast("bigint").alias("n_gaps"),
            F.sum(
                F.col("reading").eqNullSafe(F.lit(None).cast("double")).cast("int")
            )
            .cast("bigint")
            .alias("n_nullsafe_null"),
            fixed_sum(F.coalesce(F.col("reading"), F.lit(0.0)), 2, 2).alias(
                "filled_sum"
            ),
        )
    )
