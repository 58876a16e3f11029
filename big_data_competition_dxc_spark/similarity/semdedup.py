"""Semantic deduplication over the ``embeddings`` table.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): partition the embedding
space into clusters, keep ONE representative per cluster, and prune
members whose cosine to the representative clears a threshold. Unlike
the pair-listing near-dup family (similarity/cosine.py), each vector
computes exactly ONE cosine — to its cluster representative — so the
similarity work is O(n), not O(sum of bucket²). Complements the
reference's record-level duplicate removal (流行音乐趋势预测.md:42
``select distinct *``; SURVEY.md §2.12 dedup ladder) with the
embedding-space variant a training-data pipeline needs.

Clustering here is the deterministic sign-bit partition (first
SEM_BITS dimensions' signs — the same random-hyperplane LSH family as
similarity/cosine.py's bucketing, exactly mirrorable in the DuckDB
oracle; the paper's k-means clustering is the ml/clustering.py path and
stays rows-only by seed). Representative = min vec_id in the bucket —
deterministic, engine-agnostic.

Scale path (100 TB): one hash-shuffle on the bucket key for the
representative argmin, then the (2^SEM_BITS-row, i.e. tiny) keeper
table broadcasts back onto the corpus — the corpus itself never
re-shuffles and never self-joins. Cosine is the repo's index-order
double fold (JVM ``zip_with``+``aggregate``), bit-identical to DuckDB's
``list_dot_product`` on DOUBLE[].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load
from .cosine import SQL_COS, as_double, dot

#: Sign bits in the bucket key: 2^6 = 64 clusters, ~n/64 vectors each —
#: coarse on purpose (SemDeDup uses cluster counts far below corpus
#: size; the fixture's 500-64k vectors want clusters with real
#: occupancy, not singleton buckets).
SEM_BITS = 6

#: Cosine-to-representative pruning threshold. The fixture embeddings
#: are near-random 64-dim vectors (synthetic label mixture), so the
#: paper's 0.95+ regime would prune nothing; 0.2 exercises both
#: branches of the keep/prune decision on every scale fixture.
SEM_TAU = 0.2

@query(
    "semantic_dedup_keep",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT vec_id, v,
         array_to_string(list_transform(range(1, {SEM_BITS} + 1),
                         i -> CASE WHEN v[i] >= 0 THEN '1' ELSE '0' END),
                         '') AS bucket
  FROM e
),
canon AS (SELECT bucket, MIN(vec_id) AS keeper_vec_id FROM sig GROUP BY bucket),
cv AS (SELECT c.bucket, c.keeper_vec_id, s.v AS kv
       FROM canon c JOIN sig s ON s.vec_id = c.keeper_vec_id)
SELECT s.vec_id, s.bucket, cv.keeper_vec_id,
       {sql_round(SQL_COS.format(a="s.v", b="cv.kv"), 4)} AS cos_to_keeper,
       CAST(CASE WHEN s.vec_id <> cv.keeper_vec_id
                  AND {sql_round(SQL_COS.format(a="s.v", b="cv.kv"), 4)}
                      >= {SEM_TAU}
            THEN 1 ELSE 0 END AS INT) AS pruned
FROM sig s JOIN cv ON s.bucket = cv.bucket
""",
    tags=("similarity", "dedup", "llm-pipeline"),
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SemDeDup decision table: bucket, its keeper (min
    vec_id), the ROUNDED cosine to the keeper, and the prune flag
    (non-keeper AND cos >= {SEM_TAU}). Keepers always survive with
    cos_to_keeper = 1.0. The keep-set is exactly the rows with
    pruned = 0 — a linear-output dedup, one cosine per vector."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    sig = e.select(
        "vec_id",
        "v",
        F.concat_ws(
            "",
            *[
                F.when(F.element_at("v", i) >= 0, "1").otherwise("0")
                for i in range(1, SEM_BITS + 1)
            ],
        ).alias("bucket"),
    )
    canon = sig.groupBy("bucket").agg(F.min("vec_id").alias("keeper_vec_id"))
    canon_v = canon.join(
        sig.select(F.col("vec_id").alias("keeper_vec_id"), F.col("v").alias("kv")),
        "keeper_vec_id",
    )
    joined = sig.join(F.broadcast(canon_v), "bucket")
    cos = dot(F.col("v"), F.col("kv")) / (
        F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(F.col("kv"), F.col("kv")))
    )
    return joined.select(
        "vec_id",
        "bucket",
        "keeper_vec_id",
        round_to(cos, 4).alias("cos_to_keeper"),
    ).withColumn(
        "pruned",
        (
            (F.col("vec_id") != F.col("keeper_vec_id"))
            & (F.col("cos_to_keeper") >= SEM_TAU)
        ).cast("int"),
    )
