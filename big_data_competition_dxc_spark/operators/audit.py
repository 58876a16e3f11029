"""Data-quality audits a warehouse runs before trusting a new load:
referential integrity across every FK edge, and join-key skew
profiling.

The reference trusts its joins blindly (流行音乐趋势预测.md joins carry no
orphan checks); at 100 TB a silent orphan rate is how a LEFT JOIN
quietly nulls a feature column. Both audits are pure aggregates —
anti-join counts and a per-key histogram — so they cost one pass each
and emit dashboard-sized results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

# (edge name, child table, child key, parent table, parent key)
_FK_EDGES = (
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

_INTEGRITY_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(COUNT(DISTINCT {ck}) AS BIGINT) AS n_child_keys,
       CAST(SUM(CASE WHEN {ck} IS NULL THEN 1
                     WHEN {ck} NOT IN (SELECT {pk} FROM {parent}) THEN 1
                     ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child}"""
    for edge, child, ck, parent, pk in _FK_EDGES
)


@query("referential_integrity_audit", oracle=_INTEGRITY_ORACLE, tags=("J8", "A8", "audit"))
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge of the star schema: child rows, distinct
    child keys, and orphans (child keys with no parent — NULLs count as
    orphans). Each edge is a left-anti join against a broadcast parent
    key set; the union of seven 1-row aggregates is driver-trivial
    while each scan is a single pass. The load gate a 100 TB ingest
    runs before any downstream join is allowed to assume its dims."""
    out = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(pk).distinct()
        orphans = (
            c.join(F.broadcast(p), c[ck] == p[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select("n_orphans")
        )
        stats = c.agg(
            F.count("*").alias("n_child_rows"),
            F.countDistinct(ck).alias("n_child_keys"),
        )
        row = (
            stats.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(edge).alias("fk_edge"),
                "n_child_rows",
                "n_child_keys",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


SKEW_KEY = "user_id"

_SKEW_ORACLE = f"""
WITH per_key AS (
  SELECT {SKEW_KEY} AS k, COUNT(*) AS n FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MIN(n) AS BIGINT) AS min_rows,
       CAST(MAX(n) AS BIGINT) AS max_rows,
       {sql_round('quantile_cont(n, 0.99)', 4)} AS p99_rows,
       {sql_round('CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n)', 4)} AS skew_factor,
       CAST(MIN(CASE WHEN n = (SELECT MAX(n) FROM per_key) THEN k END) AS BIGINT)
         AS hottest_key
FROM per_key
"""


@query("join_key_skew_profile", oracle=_SKEW_ORACLE, tags=("A9", "audit", "skew"))
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis for a prospective shuffle key: per-key
    row counts reduced to the numbers that decide a join strategy —
    max/p99 group size, the skew factor (hottest key vs perfectly
    uniform), and WHICH key is hottest (min key id among ties, so the
    answer is deterministic). This is the measurement behind the
    salting/AQE-skew-join decisions documented in
    operators/bucketing.py; at 100 TB it is one partial-agg pass plus
    a scalar reduce."""
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy(F.col(SKEW_KEY).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    # single-pass deterministic argmax: max over (n, -k) structs picks
    # the highest count and, among ties, the LOWEST key id
    best = F.max(F.struct(F.col("n").alias("n"), (-F.col("k")).alias("neg_k")))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        round_to(F.percentile("n", F.lit(0.99)), 4).alias("p99_rows"),
        round_to(F.max("n").cast("double") * F.count("*") / F.sum("n"), 4).alias(
            "skew_factor"
        ),
        (-best.getField("neg_k")).cast("bigint").alias("hottest_key"),
    )
