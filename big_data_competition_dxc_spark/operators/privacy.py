"""Privacy / governance operators for training-data pipelines.

textops/scrub.py redacts PII patterns from free text; this module
covers the RELATIONAL side of the same governance story:

- ``pseudonymize_consistent_join``: keyed tokenization that REPLACES
  identifiers while preserving referential integrity — the same
  salted-hash token is derived for a key wherever it appears, so
  pseudonymized tables still join (the property plain redaction
  destroys, and the reason anonymized training corpora remain
  linkable across their fact tables). The query proves it: customers
  and orders are tokenized independently, joined ON THE TOKEN, and the
  per-segment counts must equal the plaintext join's.
- ``k_anonymity_groups``: quasi-identifier risk accounting — group
  sizes over (nation, segment); groups smaller than K are suppressed
  (the k-anonymity release rule) and accounted in a single audit row
  instead of being leaked as small groups.

Determinism: tokens are md5 over salt||key — identical builtin on
Spark and DuckDB; all counts are exact integers.

Scale notes (100 TB): tokenization is a narrow per-row projection (no
shuffle, pushes through scans); the token join shuffles exactly like
the key join it replaces (same cardinalities — tokens are injective
per salt modulo md5 collisions). k-anonymity is one groupBy plus a
broadcast-sized suppressed-roll-up; the suppression threshold check
happens on aggregated group counts, never row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

SALT = "corpus-release-7"
TOKEN_LEN = 16
K_ANON = 10


def _token(col: F.Column) -> F.Column:
    return F.substring(F.md5(F.concat(F.lit(SALT), col.cast("string"))), 1, TOKEN_LEN)


@query(
    "pseudonymize_consistent_join",
    oracle=f"""
WITH c AS (
  SELECT substr(md5('{SALT}' || CAST(c_custkey AS VARCHAR)), 1, {TOKEN_LEN}) AS ctok,
         c_mktsegment
  FROM customer
),
o AS (
  SELECT substr(md5('{SALT}' || CAST(o_custkey AS VARCHAR)), 1, {TOKEN_LEN}) AS otok
  FROM orders
)
SELECT c.c_mktsegment AS mktsegment,
       COUNT(o.otok) AS n_orders,
       COUNT(DISTINCT c.ctok) AS n_customers,
       MIN(c.ctok) AS sample_token
FROM c LEFT JOIN o ON o.otok = c.ctok
GROUP BY c.c_mktsegment
""",
    tags=("governance", "J1", "A1", "F11"),
)
def pseudonymize_consistent_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers and orders pseudonymized independently with the same
    salted token, then joined ON TOKEN: per-segment order/customer
    counts must equal the plaintext join's (referential integrity
    survives pseudonymization)."""
    c = load(spark, sf_dir, "customer").select(
        _token(F.col("c_custkey")).alias("ctok"), "c_mktsegment"
    )
    o = load(spark, sf_dir, "orders").select(
        _token(F.col("o_custkey")).alias("otok")
    )
    return (
        c.join(o, c.ctok == o.otok, "left")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("otok").alias("n_orders"),
            F.countDistinct("ctok").alias("n_customers"),
            F.min("ctok").alias("sample_token"),
        )
    )


@query(
    "k_anonymity_groups",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, n, 'kept' AS status
FROM g WHERE n >= {K_ANON}
UNION ALL
SELECT CAST(NULL AS BIGINT) AS c_nationkey, CAST(NULL AS VARCHAR) AS c_mktsegment,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n, 'suppressed' AS status
FROM g WHERE n < {K_ANON}
""",
    tags=("governance", "A1", "U1", "P10"),
)
def k_anonymity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier (nation, segment) group sizes with k-anonymity
    release semantics: groups below K={K_ANON} are suppressed and
    surface only as one aggregate audit row (their total row count) —
    never as identifiable small groups."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    kept = g.filter(F.col("n") >= K_ANON).select(
        "c_nationkey", "c_mktsegment", "n", F.lit("kept").alias("status")
    )
    suppressed = (
        g.filter(F.col("n") < K_ANON)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"))
        .select(
            F.lit(None).cast("bigint").alias("c_nationkey"),
            F.lit(None).cast("string").alias("c_mktsegment"),
            "n",
            F.lit("suppressed").alias("status"),
        )
    )
    return kept.unionByName(suppressed)
