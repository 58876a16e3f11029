"""N-gram language-model quality scoring (the CCNet-style LM filter).

Web-scale pipelines score every document's cross-entropy under a
language model and drop the high-perplexity tail (CCNet buckets by
KenLM perplexity; Gopher/RefinedWeb keep LM-likelihood gates). This
operator is the relational analogue: an add-one-smoothed BIGRAM model
trained on the corpus itself, scoring each document's per-token
cross-entropy — documents whose word sequences are atypical for the
corpus score high. Beyond the reference surface (SURVEY §2 has no text
scoring); complements the lexical gates in textops/quality.py.

Scale shape: bigrams come from zipping the pre-split word array with
its own tail (arrays_zip of two slices) — no window function, no
per-word shuffle; the context-count and bigram-count tables are
vocabulary-sized (Heaps' law keeps them millions of rows at 100 TB,
far below the corpus), so the context table broadcasts and only
(w1, w2) pairs shuffle into the bigram join; the per-doc sum is one
map-side-combined aggregation.

Float determinism: each bigram's ln(p) is rounded to exact 1e-4 units
(floor(x*1e4+0.5) — same cross-engine IEEE form as
functions/rounding.py) BEFORE the per-doc sum, which then accumulates
exactly as DECIMAL(38,0): the sum is order-independent and the only
analog quantity is the single ln() per distinct bigram, which never
lands on a unit boundary by construction (same convention as
textops/relevance.py's TF-IDF scores)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

_UNIT = 10**4


@query(
    "lm_bigram_cross_entropy",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(text)), ' ')) AS term,
         generate_subscripts(string_split(lower(trim(text)), ' '), 1) AS pos
  FROM documents
),
bigrams AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigrams GROUP BY w1, w2
),
c1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bigrams GROUP BY w1
),
vocab AS (
  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM toks
),
scored AS (
  SELECT bg.doc_id,
         CAST(floor(ln((c12.c12 + 1.0) / (c1.c1 + vocab.v)) * {_UNIT}.0 + 0.5)
              AS DECIMAL(38,0)) AS lp_units
  FROM bigrams bg
  JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
  JOIN c1 ON bg.w1 = c1.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       {sql_round(
           f"-(CAST(SUM(lp_units) AS DOUBLE) / {_UNIT}.0) / COUNT(*)", 4)}
         AS cross_entropy
FROM scored
GROUP BY doc_id
""",
    tags=("textops", "A4", "J2"),
)
def lm_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed bigram LM
    trained on the whole corpus: mean over positions of
    -ln((c(w1,w2)+1)/(c(w1)+V)). Lower = more corpus-typical."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("words")
    )
    n = F.size("words")
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("words", 1, n - 1).alias("w1"),
                F.slice(F.col("words"), 2, n - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bigrams.groupBy(F.col("w1").alias("c1_w1")).agg(F.count("*").alias("c1"))
    vocab = (
        docs.select(F.explode("words").alias("term"))
        .agg(F.count_distinct("term").alias("v"))
    )
    lp_units = F.floor(
        F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
        * F.lit(float(_UNIT))
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    return (
        bigrams.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), F.col("w1") == F.col("c1_w1"))
        .join(F.broadcast(vocab))
        .select("doc_id", lp_units.alias("lp_units"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            round_to(
                -(F.sum("lp_units").cast("double") / F.lit(float(_UNIT)))
                / F.count("*"),
                4,
            ).alias("cross_entropy"),
        )
    )
