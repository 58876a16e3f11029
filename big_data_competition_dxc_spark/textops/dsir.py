"""DSIR-style importance weights + resampling for targeted selection.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every raw-pool document by the
log-likelihood ratio of a TARGET-domain n-gram model over a RAW-pool
n-gram model, both over a small hashed feature space, then resamples by
the weights. ``dsir_importance_weights`` computes the per-document
log-ratio with hashed unigram features (target = the ``lang = 'en'``
slice standing in for the curated target corpus, raw pool = all
documents); ``dsir_resample_keep`` turns the weights into the
DETERMINISTIC keep/drop decision — the paper's importance resampling,
realized with the repo's md5-uniform basis-point idiom
(operators/sampling.py quality_weighted_sample) so the selection is
auditable and engine-exact instead of RNG-dependent. Complements
textops/mixture.py (corpus-level mixture proportions) with the
per-document reweighting view; beyond the reference surface, which has
no text scoring (SURVEY §2.12).

Scale path (100 TB): ONE pass over the token stream computes both
models — the per-bucket target and pool counts come from a single
conditional aggregation (no second corpus scan), and the model is
N_BUCKETS rows by construction (DSIR's hashed features exist precisely
so the model size is independent of corpus size). The per-bucket
log-ratio table broadcasts onto the token stream; the only corpus-sized
shuffle is the final per-doc sum, map-side combined. The resampling
decision is a pure per-row map over that doc-level table — zero
additional shuffles, zero additional corpus scans.

Float determinism (same convention as textops/lm_quality.py): the two
ln() calls happen once per DISTINCT bucket (128 analog values per
corpus), are differenced and immediately rounded to exact 1e-4 units;
per-document accumulation is an exact DECIMAL(38,0) integer sum —
order-independent, engine-identical. The keep threshold divides that
exact integer sum by the exact token count in IEEE double (correctly
rounded in both engines) and floors — integer-exact boundaries, so the
keep/drop compare can never sit on a float knife edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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

#: Resampling clamp, in basis points: keep-probability is centered at
#: 50% and shifted by the per-token mean log-ratio in 1e-4 units, so a
#: doc whose average token is e^0.05 more target-like (+500 units)
#: keeps at 55%. Floor 5% (never fully drop a stratum), cap 100%.
KEEP_BASE_BPS = 5000
KEEP_MIN_BPS = 500
KEEP_MAX_BPS = 10000

#: The keep-probability (basis points) and uniform-draw SQL fragments,
#: parameterized on the table alias holding (units, n_tokens, doc_id) —
#: factored so the standalone resample query and compositions
#: (textops/release.py) can never drift on the decision definition.
SQL_KEEP_BPS = (
    f"CAST(LEAST({KEEP_MAX_BPS}, GREATEST({KEEP_MIN_BPS}, {KEEP_BASE_BPS}"
    " + CAST(floor(CAST({t}.units AS DOUBLE) / {t}.n_tokens) AS BIGINT)))"
    " AS BIGINT)"
)
SQL_KEEP_U = "({md5} % 10000)"


def keep_bps_col() -> Column:
    """Keep-probability in basis points over (units, n_tokens) columns —
    the Spark twin of :data:`SQL_KEEP_BPS`."""
    avg_units = F.floor(
        F.col("units").cast("double") / F.col("n_tokens")
    ).cast("bigint")
    return F.least(
        F.lit(KEEP_MAX_BPS).cast("bigint"),
        F.greatest(
            F.lit(KEEP_MIN_BPS).cast("bigint"),
            (F.lit(KEEP_BASE_BPS) + avg_units).cast("bigint"),
        ),
    )


def dsir_doc_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, units) — per-document exact integer sum of
    per-token log-ratio units under the hashed-unigram DSIR models.
    The shared upstream of both registered queries: one token pass
    builds both models, the {N_BUCKETS}-row log-ratio table broadcasts
    back, and the only corpus-sized shuffle is the per-doc sum."""
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
            F.sum("units").alias("units"),
        )
    )


#: Shared oracle CTE chain ending in the per-doc exact unit sums.
_SQL_DSIR = f"""
toks AS (
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
),
doc AS (
  SELECT toks.doc_id,
         COUNT(*) AS n_tokens,
         SUM(llr.units) AS units
  FROM toks JOIN llr USING (b)
  GROUP BY toks.doc_id
)
"""


@query(
    "dsir_importance_weights",
    oracle=f"""
WITH {_SQL_DSIR}
SELECT doc_id, n_tokens,
       {sql_round(f"units / {_UNIT}.0", 4)} AS dsir_logratio
FROM doc
""",
    tags=("textops", "llm-pipeline", "sampling"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight: sum over tokens of
    ln(p_target(bucket)) - ln(p_pool(bucket)) under add-one-smoothed
    hashed-unigram models ({N_BUCKETS} buckets). Positive = looks like
    the '{TARGET_LANG}' target; resampling keeps documents with
    probability proportional to exp(weight)."""
    return dsir_doc_units(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        round_to(F.col("units") / float(_UNIT), 4).alias("dsir_logratio"),
    )


@query(
    "dsir_resample_keep",
    oracle=f"""
WITH {_SQL_DSIR},
scored AS (
  SELECT doc_id, n_tokens,
         {sql_round(f"units / {_UNIT}.0", 4)} AS dsir_logratio,
         {SQL_KEEP_BPS.format(t="doc")} AS keep_bps,
         {SQL_KEEP_U.format(md5=sql_md5_bigint("CAST(doc_id AS VARCHAR)"))} AS u
  FROM doc
)
SELECT doc_id, n_tokens, dsir_logratio, keep_bps,
       CAST(CASE WHEN u < keep_bps THEN 1 ELSE 0 END AS INT) AS kept
FROM scored
""",
    tags=("textops", "llm-pipeline", "sampling"),
)
def dsir_resample_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling DECISION that completes DSIR: per document, the
    keep-probability in basis points ({KEEP_BASE_BPS} + floor(mean
    per-token log-ratio units), clamped to [{KEEP_MIN_BPS},
    {KEEP_MAX_BPS}]) and the deterministic keep flag — md5(doc_id) %
    10000 < keep_bps, the same auditable uniform as
    quality_weighted_sample, so target-like documents survive at
    higher rates without any RNG. The keep-set is exactly the rows
    with kept = 1; raising the clamp only ADDS rows (stable
    incremental curation). Zero shuffles beyond the weights
    computation itself."""
    doc = dsir_doc_units(spark, sf_dir)
    keep_bps = keep_bps_col()
    u = md5_bigint(F.col("doc_id").cast("string")) % 10000
    return doc.select(
        "doc_id",
        "n_tokens",
        round_to(F.col("units") / float(_UNIT), 4).alias("dsir_logratio"),
        keep_bps.alias("keep_bps"),
        (u < keep_bps).cast("int").alias("kept"),
    )
