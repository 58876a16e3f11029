"""Feature pipeline operators (SURVEY §2.10 ML1–ML3).

ML1 vector assembly (Vectors.dense, 流行音乐趋势预测.md:143,174),
ML2 standardization (M:136-153), ML3 PCA k=8 (M:164-184).

Deviation note (SURVEY §7.3): the reference normalizes by dividing by
the VARIANCE (M:149-153), not the standard deviation — a bug that
contributed to its linear-regression failure (M:223-234). We implement
the correct z-score via StandardScaler and document the difference
instead of replicating it.

ML queries are registered WITHOUT oracles (rows-only driver check):
model outputs are not SQL-expressible and exact values are not
guaranteed stable across Spark versions (SURVEY §7.4). Seeds pin OUR
runs; the queries also self-validate (finite metrics, expected shapes)
in tests/test_ml.py.

Outputs are SCALAR-ONLY by contract even though these are rows-only
queries: the driver's canonicalizer cannot handle array cells (the
round-3 multimodal `err` was exactly this — pandas sort_values raising
"unhashable type: 'list'"), so the vector columns are published as one
named scalar column per component (the dimensionalities are fixed
constants of each operator).
"""

from __future__ import annotations

from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from functools import reduce

from ..functions.rounding import round_to, to_units
from ..plans.registry import query
from ..sources import load

FEATURE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def assemble_features(df: DataFrame, cols=FEATURE_COLS, out: str = "features") -> DataFrame:
    """ML1: typed columns -> dense ml vector (replaces Vectors.dense rows)."""
    return VectorAssembler(inputCols=list(cols), outputCol=out).transform(df)


@query("ml_features_scaled", tags=("ML1", "ML2"))
def ml_features_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML1+ML2: assemble lineitem numerics, z-score standardize
    (withMean+withStd — the CORRECT form of the reference's
    mean/variance normalizer, M:136-153)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *FEATURE_COLS
    )
    assembled = assemble_features(li)
    scaler = StandardScaler(
        inputCol="features", outputCol="scaled", withMean=True, withStd=True
    )
    model = scaler.fit(assembled)
    out = model.transform(assembled)
    arr = vector_to_array(F.col("scaled"))
    result = out.select(
        "l_orderkey",
        "l_linenumber",
        *[
            round_to(arr[i], 4).alias(f"scaled_{c.removeprefix('l_')}")
            for i, c in enumerate(FEATURE_COLS)
        ],
    )
    return _attach_abs_units_audit(
        result, [f"scaled_{c.removeprefix('l_')}" for c in FEATURE_COLS]
    )


def _attach_abs_units_audit(result: DataFrame, cols: list[str]) -> DataFrame:
    """Audited determinism scalar for the distributed-output ML queries
    (r10, the ML8/ML10/ML12 treatment): |value| summed in exact
    4-decimal integer units across every row and feature column —
    order-independent (DECIMAL accumulation, abs also absorbs PCA sign
    convention) — attached to every row via a broadcast 1-row cross
    join. The driver's rows-only check previously pinned only the row
    count; tests/test_ml.py pins this scalar identical across runs.

    Cost note: the attach evaluates the result subtree twice (once for
    the audit agg, once for the output) — a deliberate trade: both
    passes are linear, the queries are non-headline rows-only ML, and
    a cache here would pin a corpus-sized frame for a 1-row scalar.
    Both scale factors pay the same 2x, so sf1/sf0.1 spotlight ratios
    are unaffected."""
    units = reduce(
        lambda a, b: a + b, [to_units(F.abs(F.col(c)), 4) for c in cols]
    )
    audit = result.agg(F.sum(units).cast("bigint").alias("audit_abs_units"))
    return result.crossJoin(F.broadcast(audit))


@query("ml_pca_embeddings", tags=("ML3",))
def ml_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3 (M:164-184): PCA 64 -> 8 components on the embeddings table
    (the reference went 12 -> 8 on its feature matrix). Labels ride
    alongside, as in the reference's LabelsPoint struct (M:171-174)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        array_to_vector(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("features"),
    )
    pca = PCA(k=8, inputCol="features", outputCol="pca")
    model = pca.fit(emb)
    arr = vector_to_array(F.col("pca"))
    result = model.transform(emb).select(
        "vec_id",
        "label",
        *[round_to(arr[i], 4).alias(f"pc{i}") for i in range(8)],
    )
    return _attach_abs_units_audit(result, [f"pc{i}" for i in range(8)])
