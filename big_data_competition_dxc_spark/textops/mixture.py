"""Temperature-based mixture rates derived FROM corpus statistics.

domain_mixing_weights (textops/packing.py) applies hand-set per-domain
keep rates; multilingual pretraining practice derives them instead:
temperature sampling flattens the domain distribution by weighting
each domain w_d ∝ n_d^(1/T) and sizing per-doc keep rates so the
sampled corpus hits a global budget B with domain shares ∝ w_d. This
operator computes those rates for T=2 (α=0.5) and applies them with
the portable md5 threshold.

Determinism design: α=0.5 means w_d = sqrt(n_d) — and IEEE sqrt is
CORRECTLY ROUNDED on every conforming engine (unlike pow/exp/log,
whose libm implementations differ in the last ulp — the reason α is
0.5 here and not 0.7). The rounded sqrt is immediately floored to
integer micro-units; every downstream product, sum, and floor-division
is exact BIGINT arithmetic:

    rate_bp(d) = min(10000, (10000 * (N div 2) * w_d) div (W * n_d))

so the derived rates — and therefore the sampled subset — are
bit-identical cross-engine. The numerator is computed in 128-bit
integer arithmetic on BOTH engines (Spark DECIMAL(38,0), DuckDB
HUGEINT — the 5-row rate table makes this free): int64 would wrap
silently in Spark at ~2e6 docs (BP·(N div 2)·w ≈ 1e4·1e6·1.4e9
already exceeds 2^63) while DuckDB raises, the worst kind of
cross-engine divergence. In 128 bits the numerator bound is 1e38,
i.e. ~1e12 docs with room to spare, and the final quotient
(≤ BP/2 · sqrt(N) for the smallest domain) fits BIGINT at any
plausible corpus size.

Scale notes (100 TB): two scans of (doc_id, lang) — one for counts
(map-side-combinable groupBy), one to apply the broadcast 5-row rate
table — both single-pass, no shuffle beyond the tiny count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..plans.registry import query
from ..sources import load

BP = 10_000
W_UNITS = 1_000_000


@query(
    "temperature_mixture_rates",
    oracle=f"""
WITH c AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
w AS (SELECT lang, n_total,
             CAST(floor(sqrt(n_total) * {W_UNITS}.0) AS BIGINT) AS w
      FROM c),
t AS (SELECT SUM(n_total) AS n_corpus, SUM(w) AS w_sum FROM w),
r AS (
  SELECT lang, n_total,
         CAST(least({BP},
              ({BP}::HUGEINT * ((SELECT n_corpus FROM t) // 2) * w)
              // ((SELECT w_sum FROM t)::HUGEINT * n_total)) AS BIGINT) AS rate_bp
  FROM w
),
k AS (
  SELECT d.lang, r.n_total, r.rate_bp,
         CASE WHEN {sql_md5_bigint("CAST(d.doc_id AS VARCHAR)")} % {BP}
                   < r.rate_bp THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN r ON d.lang = r.lang
)
SELECT lang,
       CAST(MAX(n_total) AS BIGINT) AS n_total,
       CAST(MAX(rate_bp) AS BIGINT) AS rate_bp,
       CAST(SUM(kept) AS BIGINT) AS n_kept
FROM k GROUP BY lang
""",
    tags=("textops", "sampling", "A1"),
)
def temperature_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language T=2 temperature-sampling keep rates (basis points)
    targeting a half-corpus budget, derived entirely in exact integer
    arithmetic from the corpus counts, then applied with the md5
    threshold; per-language kept counts verify the realized mixture."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    w = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("n_total")) * F.lit(float(W_UNITS))).cast("bigint")
    )
    totals = w.agg(
        F.sum("n_total").alias("n_corpus"), F.sum("w").alias("w_sum")
    )
    rates = (
        w.join(F.broadcast(totals))  # 1-row totals scalar attach
        .withColumn(
            "rate_bp",
            F.least(
                F.lit(BP).cast("bigint"),
                F.expr(
                    f"(CAST({BP} AS DECIMAL(38,0))"
                    f" * CAST(n_corpus div 2 AS DECIMAL(38,0))"
                    f" * CAST(w AS DECIMAL(38,0)))"
                    f" div (CAST(w_sum AS DECIMAL(38,0))"
                    f" * CAST(n_total AS DECIMAL(38,0)))"
                ),
            ).cast("bigint"),
        )
        .select("lang", "n_total", "rate_bp")
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .withColumn(
            "kept",
            (md5_bigint(F.col("doc_id").cast("string")) % BP < F.col("rate_bp"))
            .cast("int"),
        )
    )
    return kept.groupBy("lang").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.max("rate_bp").cast("bigint").alias("rate_bp"),
        F.sum("kept").cast("bigint").alias("n_kept"),
    )
