"""Embedding quantization: per-vector symmetric int8 with error audit.

Vector stores ship int8-quantized embeddings (4x smaller, SIMD
dot-products); the pipeline step is: per vector, scale =
max(|v|)/127, q_i = round(v_i/scale), and an audit of the
reconstruction error before the quantized corpus replaces the fp32
one.

Determinism across engines: every arithmetic step is IEEE double ops
in an identical expression tree (float32 inputs widen exactly), the
per-element squared error is converted to exact integer units
(floor(e*1e12+0.5)) BEFORE summation, and the sums are
DECIMAL(38,0) — so the hash-compared result is bit-identical
regardless of row order, partition layout, or engine (same
argument as functions/rounding.py's fixed_sum).

Scale notes (100 TB): per-vector work is explode -> narrow math ->
hash aggregate on vec_id; elements of a vector never leave their
input partition before the partial aggregate. No Python, no UDFs —
whole-stage codegen end to end.

No reference-repo counterpart (SURVEY §2 extension: similarity
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

QMAX = 127
ERR_UNITS = 10**12  # squared-error fixed-point grid

_QUANT_ORACLE = f"""
WITH t AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           / {QMAX}.0 AS scale,
         embedding
  FROM embeddings
), e AS (
  SELECT vec_id, scale,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM t
), q AS (
  SELECT vec_id, scale, v,
         floor(v / scale + 0.5) AS qv
  FROM e
)
SELECT vec_id,
       (floor(MAX(scale) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE))
         AS scale,
       CAST(COUNT(*) AS BIGINT) AS dim,
       CAST(MAX(abs(qv)) AS BIGINT) AS q_absmax,
       CAST(SUM(CAST(floor((v - qv * scale) * (v - qv * scale)
                           * {ERR_UNITS}.0 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT) AS sq_err_units
FROM q GROUP BY vec_id
"""


@query("embedding_quantize_int8", oracle=_QUANT_ORACLE, tags=("similarity", "quantize"))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per vector, the scale, the
    realized |q|max (must be <= 127), and the total squared
    reconstruction error in exact 1e-12 fixed-point units. Explode +
    one hash aggregate on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(
            F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
        )
        / QMAX
    )
    e = emb.select(
        "vec_id",
        scale.alias("scale"),
        F.explode(F.col("embedding")).alias("raw"),
    ).select(
        "vec_id", "scale", F.col("raw").cast("double").alias("v")
    )
    qv = F.floor(F.col("v") / F.col("scale") + 0.5)
    err = F.col("v") - qv * F.col("scale")
    q = e.select(
        "vec_id",
        "scale",
        qv.alias("qv"),
        F.floor(err * err * F.lit(float(ERR_UNITS)) + 0.5)
        .cast("decimal(38,0)")
        .alias("sq_units"),
    )
    return q.groupBy("vec_id").agg(
        (F.floor(F.max("scale") * 1000000.0 + 0.5) / F.lit(1000000.0)).alias(
            "scale"
        ),
        F.count("*").alias("dim"),
        F.max(F.abs(F.col("qv"))).cast("bigint").alias("q_absmax"),
        F.sum("sq_units").cast("bigint").alias("sq_err_units"),
    )
