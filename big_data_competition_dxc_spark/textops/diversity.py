"""Lexical-diversity quality signals per document — the repetition/
vocabulary-richness axis of training-data curation (complements
textops/quality.py's length/punctuation heuristics and
textops/repetition.py's n-gram self-overlap).

Per document, from the whitespace token stream:

- ``n_tokens`` / ``n_types`` and the type-token ratio (TTR) — the
  classic vocabulary-richness score; low TTR flags boilerplate.
- ``top_tok_share`` — mass of the single most frequent token; high
  share flags keyword-stuffed or degenerate text.
- ``simpson_div`` — the Gini-Simpson diversity 1 - sum(c*(c-1)) /
  (N*(N-1)): the probability two random tokens differ. This is the
  HASH-EXACT diversity measure: every accumulated term is an integer
  product (c*(c-1)) summed exactly in DECIMAL(38,0), with one final
  integer->double division. Shannon entropy was deliberately NOT used
  here: its per-term c*log(c) floats would put ~1e-6-scale libm ulp
  noise under a floor()-unit boundary across millions of terms, and a
  cross-engine hash gate cannot carry that flake risk (see
  functions/rounding.py for the accumulation-order discipline).

100 TB: explode -> two hash aggregations keyed by (doc, token) then
doc — linear in corpus token count, no driver state, no skew beyond
pathological single documents (which AQE skew-split handles since the
first aggregation's key includes the token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

_DIVERSITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents
), counts AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM toks
  WHERE tok <> ''
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       {sql_round("CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)", 6)} AS ttr,
       {sql_round("CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)", 6)}
         AS top_tok_share,
       {sql_round(
           "1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)"
           " / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) - 1 AS DOUBLE))", 6
       )} AS simpson_div
FROM counts
GROUP BY doc_id
HAVING SUM(c) > 1
"""


@query(
    "token_diversity_stats",
    oracle=_DIVERSITY_ORACLE,
    tags=("textops", "quality", "A5"),
)
def token_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTR, top-token share, and Gini-Simpson diversity per document,
    accumulated entirely in exact integer arithmetic."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    c = F.col("c").cast("decimal(38,0)")
    n_tok = F.sum(c)
    return (
        counts.groupBy("doc_id")
        .agg(
            n_tok.cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_types"),
            round_to(
                F.count("*").cast("double") / n_tok.cast("double"), 6
            ).alias("ttr"),
            round_to(
                F.max("c").cast("double") / n_tok.cast("double"), 6
            ).alias("top_tok_share"),
            round_to(
                F.lit(1.0)
                - F.sum(c * (c - F.lit(1))).cast("double")
                / (n_tok.cast("double") * (n_tok - F.lit(1)).cast("double")),
                6,
            ).alias("simpson_div"),
        )
        .filter(F.col("n_tokens") > 1)
    )
