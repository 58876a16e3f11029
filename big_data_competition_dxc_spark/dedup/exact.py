"""Exact deduplication over the ``documents`` table.

Scale path: hash-groupBy — one shuffle on the fingerprint, map-side
partial aggregation; at 100 TB the md5 is computed scan-side so only
(fingerprint, doc_id) pairs shuffle, never the text payload.
Extends the reference's row-level DISTINCT (流行音乐趋势预测.md:42) to
content-hash dedup for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load


@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS fingerprint,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
    tags=("dedup", "A7"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content fingerprint, keep the lowest doc_id."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "doc_fingerprint_normalized",
    oracle="""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_fingerprint
FROM documents
""",
    tags=("dedup", "fingerprint"),
)
def doc_fingerprint_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized fingerprint: lowercase + whitespace-collapse before
    hashing — catches trivial formatting dups exact dedup misses.
    (Spark regexp_replace is global by default; DuckDB needs the 'g'
    flag — a pinned dialect difference.)"""
    docs = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("norm_fingerprint"))
