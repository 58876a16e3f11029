"""The Arrow Pandas-UDF similarity path, oracle-paired.

The engine's default cosine is the JVM fold (similarity/cosine.py —
zero Python in the plan, the right hot path). This module pins the
SLOW path's correctness: a vectorized ``@pandas_udf`` computing the
same cosine over Arrow record batches must hash-match the same DuckDB
SQL the JVM path is checked against. That closes the loop on the
UDF-escape-hatch policy: when an operator genuinely needs Python
(custom scoring models, library calls), the Arrow path is proven
value-identical, not just "approximately right".

Bit-exactness note: the JVM ``F.aggregate`` fold and DuckDB's
``list_dot_product`` accumulate the 64-dim dot product in INDEX ORDER
as float64, but numpy's reductions (``np.sum``/``np.dot``) do NOT —
they use multi-accumulator pairwise summation even for small n, which
differs from a sequential fold in the last ulp for most inputs. A
last-ulp difference can land exactly on a 6-decimal rounding boundary,
so the UDF below avoids numpy reductions entirely: it accumulates the
dot products with an explicit per-index loop of vectorized column
adds (64 adds over the whole batch — still Arrow-speed), making the
accumulation order identical across all three runtimes. The residual
risk is only that a future DuckDB could vectorize list_dot_product's
accumulation; the 6-decimal rounding on both sides keeps that a
visible hash mismatch rather than silent noise. float32 inputs upcast
to float64 losslessly.

100 TB: one narrow Arrow-batched pass, no shuffle; the query vector
rides into the UDF closure (broadcast-variable equivalent). Batch
size via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

QUERY_VEC_ID = 0

_SQL_COS_Q = (
    "(list_dot_product(e.v, q.qv) / "
    "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))))"
)

_PANDAS_COS_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id,
       {sql_round(_SQL_COS_Q, 6)} AS sim
FROM e, q
WHERE e.vec_id <> {QUERY_VEC_ID}
"""


def linear_dot(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Row-wise dot of batch ``m`` (n x d) against ``v`` (d,), accumulated
    in index order — one vectorized add per dimension, so the float64
    accumulation sequence matches a sequential fold exactly (unlike
    np.sum/np.dot's pairwise blocking)."""
    acc = np.zeros(m.shape[0], dtype=np.float64)
    for j in range(m.shape[1]):
        acc += m[:, j] * v[j]
    return acc


def linear_row_sq(m: np.ndarray) -> np.ndarray:
    """Row-wise sum of squares, index-order accumulation."""
    acc = np.zeros(m.shape[0], dtype=np.float64)
    for j in range(m.shape[1]):
        acc += m[:, j] * m[:, j]
    return acc


def raw_cosine_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unrounded pandas-UDF cosine vs the QUERY_VEC_ID vector (internal
    + tests: the bit-exactness check compares these raw values against
    the JVM fold before any rounding)."""
    emb = load(spark, sf_dir, "embeddings")
    # one 64-float query vector: tiny driver state, closure-captured
    # (the broadcast-variable pattern)
    [qrow] = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    qq = 0.0
    for x in q:
        qq += float(x) * float(x)
    qn = float(np.sqrt(qq))

    @F.pandas_udf("double")
    def cos_q(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.to_numpy()).astype(np.float64)
        dots = linear_dot(m, q)
        norms = np.sqrt(linear_row_sq(m))
        return pd.Series(dots / (norms * qn))

    return emb.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", cos_q(F.col("embedding")).alias("sim")
    )


@query(
    "ann_cosine_pandas_udf",
    oracle=_PANDAS_COS_ORACLE,
    tags=("similarity", "ann", "pandas-udf"),
)
def ann_cosine_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector against the vec_id={QUERY_VEC_ID} query
    through a vectorized Arrow pandas_udf — value-identical to the
    JVM fold and the DuckDB oracle because the UDF forces index-order
    float64 accumulation (see module docstring)."""
    raw = raw_cosine_frame(spark, sf_dir)
    return raw.select("vec_id", round_to(F.col("sim"), 6).alias("sim"))
