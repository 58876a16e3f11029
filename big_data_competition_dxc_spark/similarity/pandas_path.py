"""The Arrow Pandas-UDF similarity path, oracle-paired.

The engine's default cosine is the JVM fold (similarity/cosine.py —
zero Python in the plan, the right hot path). This module pins the
SLOW path's correctness: a vectorized ``@pandas_udf`` computing the
same cosine over Arrow record batches must hash-match the same DuckDB
SQL the JVM path is checked against. That closes the loop on the
UDF-escape-hatch policy: when an operator genuinely needs Python
(custom scoring models, library calls), the Arrow path is proven
value-identical, not just "approximately right".

Bit-exactness note: all three engines accumulate the 64-dim dot
product in INDEX ORDER as float64 — DuckDB's list_dot_product and the
JVM F.aggregate fold are linear by construction, and numpy's
axis-reduction only switches to pairwise blocking above 128 elements —
so the comparison is exact before rounding even though it crosses
three runtimes. float32 inputs upcast to float64 losslessly.

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


@query(
    "ann_cosine_pandas_udf",
    oracle=_PANDAS_COS_ORACLE,
    tags=("similarity", "ann", "pandas-udf"),
)
def ann_cosine_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector against the vec_id={QUERY_VEC_ID} query
    through a vectorized Arrow pandas_udf — value-identical to the
    JVM fold and the DuckDB oracle (linear float64 accumulation in
    all three runtimes)."""
    emb = load(spark, sf_dir, "embeddings")
    # one 64-float query vector: tiny driver state, closure-captured
    # (the broadcast-variable pattern)
    [qrow] = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    qn = np.sqrt(np.sum(q * q))

    @F.pandas_udf("double")
    def cos_q(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.to_numpy()).astype(np.float64)
        dots = np.sum(m * q, axis=1)
        norms = np.sqrt(np.sum(m * m, axis=1))
        return pd.Series(dots / (norms * qn))

    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", round_to(cos_q(F.col("embedding")), 6).alias("sim"))
    )
