"""Repetition-based quality signals for pre-training corpus filtering.

Gopher-style repetition filters (Rae et al. 2021, §A1.1): documents
dominated by a few repeated n-grams are boilerplate/spam and get
dropped before training. Two corpus primitives live here:

- ``repetition_signals``: per-document distinct-token ratio and
  top-bigram mass — the "repeated 2-gram fraction" family.
- ``bigram_collocations``: corpus-level bigram association (lift =
  p(xy) / (p(x)p(y))) — the collocation/phrase-mining statistic used
  to build tokenizer merge tables and stop-phrase lists.

Scale notes (100 TB): both queries are explode → hash-aggregate —
one shuffle each, linear in corpus token count, no joins against the
full corpus. ``bigram_collocations`` joins the bigram table against
the two unigram tables on token, an equi-join whose build sides are
vocabulary-sized (Zipf: millions of rows, not corpus-sized) and
pre-aggregated before the join. Ranking cuts by integer support
count (deterministic), never by a float score.

No reference-repo counterpart (SURVEY §2 extension: training-data
pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

# keep/drop thresholds (Gopher uses 0.2 for top-2gram mass; the
# synthetic fixture vocabulary is tiny so the flag still splits)
MAX_TOP_BIGRAM_FRAC = 0.08
MIN_DISTINCT_RATIO = 0.30

_REP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
  FROM documents
), b AS (
  SELECT doc_id,
         len(l) AS n_tokens,
         len(list_distinct(l)) AS n_distinct,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
           AS bigram
  FROM t
), g AS (
  SELECT doc_id, MAX(n_tokens) AS n_tokens, MAX(n_distinct) AS n_distinct,
         bigram, COUNT(*) AS cnt
  FROM b GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       {sql_round('MAX(n_distinct) * 1.0 / MAX(n_tokens)', 4)} AS distinct_ratio,
       {sql_round('MAX(cnt) * 1.0 / (MAX(n_tokens) - 1)', 4)} AS top_bigram_frac,
       CASE WHEN MAX(cnt) * 1.0 / (MAX(n_tokens) - 1) <= {MAX_TOP_BIGRAM_FRAC}
             AND MAX(n_distinct) * 1.0 / MAX(n_tokens) >= {MIN_DISTINCT_RATIO}
            THEN 1 ELSE 0 END AS rep_ok
FROM g GROUP BY doc_id
"""


@query("repetition_signals", oracle=_REP_ORACLE, tags=("textops", "quality", "dedup"))
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition filter: distinct-token ratio and the
    mass of the single most frequent bigram (Gopher's repeated-2-gram
    signal). One explode + one hash aggregate on (doc_id, bigram) —
    bigrams of a document never leave their input partition before the
    partial aggregate, so the shuffle carries only per-doc bigram
    counts."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("l")
    )
    exploded = toks.filter(F.size("l") >= 2).select(
        "doc_id",
        F.size("l").alias("n_tokens"),
        F.size(F.array_distinct("l")).alias("n_distinct"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("l", i), F.element_at("l", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    per_bigram = exploded.groupBy("doc_id", "bigram").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("n_distinct").alias("n_distinct"),
        F.count("*").alias("cnt"),
    )
    n_tok = F.max("n_tokens")
    top = F.max("cnt")
    dratio = F.max("n_distinct") * F.lit(1.0) / n_tok
    tfrac = top * F.lit(1.0) / (n_tok - F.lit(1))
    return per_bigram.groupBy("doc_id").agg(
        n_tok.cast("bigint").alias("n_tokens"),
        round_to(dratio, 4).alias("distinct_ratio"),
        round_to(tfrac, 4).alias("top_bigram_frac"),
        F.when(
            (tfrac <= MAX_TOP_BIGRAM_FRAC) & (dratio >= MIN_DISTINCT_RATIO), 1
        )
        .otherwise(0)
        .alias("rep_ok"),
    )


MIN_SUPPORT = 30  # bigram must appear this often corpus-wide
TOP_COLLOC = 20

_COLLOC_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
), uni AS (
  SELECT unnest(l) AS tok FROM t
), un AS (
  SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok
), totals AS (
  SELECT SUM(c) AS n_uni FROM un
), bg AS (
  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))
           AS bigram
  FROM t
), bn AS (
  SELECT bigram, COUNT(*) AS cxy FROM bg GROUP BY bigram
), btot AS (
  SELECT SUM(cxy) AS n_bg FROM bn
), scored AS (
  SELECT b.bigram, b.cxy,
         string_split(b.bigram, ' ')[1] AS x, string_split(b.bigram, ' ')[2] AS y
  FROM bn b WHERE b.cxy >= {MIN_SUPPORT}
)
SELECT s.bigram, CAST(s.cxy AS BIGINT) AS support,
       {sql_round('((s.cxy * 1.0 / t2.n_bg) / '
                  '((ux.c * 1.0 / t.n_uni) * (uy.c * 1.0 / t.n_uni)))', 4)} AS lift
FROM scored s
JOIN un ux ON ux.tok = s.x
JOIN un uy ON uy.tok = s.y
CROSS JOIN totals t CROSS JOIN btot t2
ORDER BY s.cxy DESC, s.bigram
LIMIT {TOP_COLLOC}
"""


@query("bigram_collocations", oracle=_COLLOC_ORACLE, tags=("textops", "ngram"))
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by corpus support, scored with lift
    p(xy)/(p(x)p(y)) — the phrase-mining statistic behind tokenizer
    merge tables. The unigram and bigram tables are aggregated BEFORE
    the join, so the join operands are vocabulary-sized; the cut is by
    integer support with a lexical tiebreak (no float ordering)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("l"))
    uni = (
        toks.select(F.explode("l").alias("tok")).groupBy("tok").agg(F.count("*").alias("c"))
    )
    bg = toks.filter(F.size("l") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("l", i), F.element_at("l", i + 1)
                ),
            )
        ).alias("bigram")
    ).groupBy("bigram").agg(F.count("*").alias("cxy"))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bg = bg.agg(F.sum("cxy").alias("n_bg"))
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bg.filter(F.col("cxy") >= MIN_SUPPORT)
        .withColumn("x", parts.getItem(0))
        .withColumn("y", parts.getItem(1))
        .join(F.broadcast(uni).withColumnRenamed("tok", "x").withColumnRenamed("c", "cx"), "x")
        .join(F.broadcast(uni).withColumnRenamed("tok", "y").withColumnRenamed("c", "cy"), "y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bg))
    )
    lift = (F.col("cxy") * F.lit(1.0) / F.col("n_bg")) / (
        (F.col("cx") * F.lit(1.0) / F.col("n_uni"))
        * (F.col("cy") * F.lit(1.0) / F.col("n_uni"))
    )
    return (
        scored.select(
            "bigram",
            F.col("cxy").cast("bigint").alias("support"),
            round_to(lift, 4).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "bigram")
        .limit(TOP_COLLOC)
    )
