"""DSIR-style importance weights for targeted data selection.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every raw-pool document by the
log-likelihood ratio of a TARGET-domain n-gram model over a RAW-pool
n-gram model, both over a small hashed feature space, then resamples by
the weights. This operator computes the per-document log-ratio with
hashed unigram features: target = the ``lang = 'en'`` slice (standing
in for the curated target corpus), raw pool = all documents.
Complements textops/mixture.py (corpus-level mixture proportions) with
the per-document reweighting view; beyond the reference surface, which
has no text scoring (SURVEY §2.12).

Scale path (100 TB): ONE pass over the token stream computes both
models — the per-bucket target and pool counts come from a single
conditional aggregation (no second corpus scan), and the model is
N_BUCKETS rows by construction (DSIR's hashed features exist precisely
so the model size is independent of corpus size). The per-bucket
log-ratio table broadcasts onto the token stream; the only corpus-sized
shuffle is the final per-doc sum, map-side combined.

Float determinism (same convention as textops/lm_quality.py): the two
ln() calls happen once per DISTINCT bucket (128 analog values per
corpus), are differenced and immediately rounded to exact 1e-4 units;
per-document accumulation is an exact DECIMAL(38,0) integer sum —
order-independent, engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

#: Hashed feature-space size. DSIR uses 10k buckets at web scale; 128
#: keeps every bucket populated on the 500-doc fixture while still
#: forcing real hash collisions (the method's defining approximation).
N_BUCKETS = 128

#: Fixed-point unit for per-bucket log-ratios (1e-4, matching
#: lm_quality's convention).
_UNIT = 10**4

#: The target-domain predicate.
TARGET_LANG = "en"


@query(
    "dsir_importance_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         ({sql_md5_bigint("t.term")} % {N_BUCKETS}) AS b
  FROM documents,
       UNNEST(string_split(lower(trim(text)), ' ')) AS t(term)
),
model AS (
  SELECT b,
         COUNT(*) AS src_cnt,
         SUM(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_cnt
  FROM toks GROUP BY b
),
tot AS (
  SELECT SUM(src_cnt) AS src_tot, SUM(tgt_cnt) AS tgt_tot FROM model
),
llr AS (
  SELECT b,
         CAST(floor((ln((model.tgt_cnt + 1.0) / (tot.tgt_tot + {N_BUCKETS}.0))
                     - ln((model.src_cnt + 1.0) / (tot.src_tot + {N_BUCKETS}.0)))
                    * {_UNIT}.0 + 0.5) AS DECIMAL(38,0)) AS units
  FROM model, tot
)
SELECT toks.doc_id,
       COUNT(*) AS n_tokens,
       {sql_round(f"SUM(llr.units) / {_UNIT}.0", 4)} AS dsir_logratio
FROM toks JOIN llr USING (b)
GROUP BY toks.doc_id
""",
    tags=("textops", "llm-pipeline", "sampling"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight: sum over tokens of
    ln(p_target(bucket)) - ln(p_pool(bucket)) under add-one-smoothed
    hashed-unigram models ({N_BUCKETS} buckets). Positive = looks like
    the '{TARGET_LANG}' target; resampling keeps documents with
    probability proportional to exp(weight)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("term"),
    ).select(
        "doc_id",
        "lang",
        (md5_bigint(F.col("term")) % N_BUCKETS).alias("b"),
    )
    model = toks.groupBy("b").agg(
        F.count("*").alias("src_cnt"),
        F.sum(F.when(F.col("lang") == TARGET_LANG, 1).otherwise(0)).alias("tgt_cnt"),
    )
    tot = model.agg(
        F.sum("src_cnt").alias("src_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    # 1-row totals attach to the 128-row model (broadcast nested loop on
    # a constant-size build side), then the model broadcasts to tokens.
    llr = model.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("tgt_cnt") + 1.0) / (F.col("tgt_tot") + float(N_BUCKETS)))
                - F.log(
                    (F.col("src_cnt") + 1.0) / (F.col("src_tot") + float(N_BUCKETS))
                )
            )
            * _UNIT
            + 0.5
        )
        .cast("decimal(38,0)")
        .alias("units"),
    )
    return (
        toks.join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            round_to(F.sum("units") / float(_UNIT), 4).alias("dsir_logratio"),
        )
    )
