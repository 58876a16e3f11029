"""Corpus relevance scoring: TF-IDF keyword extraction and BM25 ranked
retrieval over the ``documents`` table.

The retrieval layer of a training-data pipeline (topic-targeted corpus
selection, query-based subset extraction) — beyond the reference's
surface (SURVEY §2: it has no text scoring at all). Everything is
relational: term stats are two groupBys over the exploded token
stream, corpus scalars ride along as a broadcast cross-join (they stay
in the Catalyst plan — no driver round-trip), and the only Python is
plan construction.

Scale shape: the token explode is scan-side and never shuffles raw
text — only (doc_id, term) pairs shuffle into the tf/df aggregations
(map-side combined). The per-term document-frequency table is
vocabulary-sized (Heaps' law: ~10^6 rows at 100 TB), so it broadcasts;
the query-term filter is applied BEFORE any join, so the BM25 join
tree only ever sees rows for the handful of query terms.

Float determinism: scores involve ln(), whose last-ulp may differ
across engines, and per-doc score sums are order-dependent; ranking
therefore uses the ROUNDED score (4 dp) with a deterministic id/term
tie-break — ln outputs are analog and never land on rounding
boundaries by construction (same convention as stddev/corr and
ann_cosine_topk). avgdl is computed as exact BIGINT sum / count, not
AVG(double), so it is bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

K1 = 1.2
B = 0.75
TOP_K = 15
QUERY_TERMS = ("spark", "join", "stream")
_QT_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_TERM_STATS_SQL = """
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) * 1.0 / COUNT(*) AS avgdl
  FROM dl
)
"""

_TFIDF_ORACLE = f"""
WITH {_TERM_STATS_SQL},
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(s.n_docs * 1.0 / dfreq.df) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY {sql_round("tf.tf * ln(s.n_docs * 1.0 / dfreq.df)", 4)} DESC,
                    tf.term
         ) AS rn
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, term AS top_term, {sql_round("tfidf", 4)} AS tfidf
FROM scored WHERE rn = 1
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("textops", "relevance"))
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's highest-TF-IDF term (keyword extraction): the
    per-doc most distinctive token under idf = ln(N/df)."""
    tf, dl, dfreq, stats = _term_stats(load(spark, sf_dir, "documents"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", tfidf.alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        round_to(F.col("tfidf"), 4).desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            round_to(F.col("tfidf"), 4).alias("tfidf"),
        )
    )


_BM25_SCORE = (
    f"ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)"
    f" * tf.tf * ({K1} + 1)"
    f" / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))"
)

_BM25_ORACLE = f"""
WITH {_TERM_STATS_SQL},
per_term AS (
  SELECT tf.doc_id, {_BM25_SCORE} AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN dfreq USING (term)
  CROSS JOIN stats s
  WHERE tf.term IN ({_QT_SQL})
),
totals AS (
  SELECT doc_id, {sql_round("SUM(score)", 4)} AS bm25
  FROM per_term GROUP BY doc_id
)
SELECT doc_id, bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
FROM totals
QUALIFY rank <= {TOP_K}
"""


@query("bm25_topk_docs", oracle=_BM25_ORACLE, tags=("textops", "relevance", "O3"))
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents for the query {spark, join, stream} under BM25
    (k1=1.2, b=0.75). The query-term filter lands on the tf aggregate
    BEFORE any join, so the join tree is query-sized, not corpus-sized."""
    tf, dl, dfreq, stats = _term_stats(load(spark, sf_dir, "documents"))
    qtf = tf.filter(F.col("term").isin(*QUERY_TERMS))
    qdf = dfreq.filter(F.col("term").isin(*QUERY_TERMS))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    score = (
        idf
        * F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    )
    totals = (
        qtf.join(dl, "doc_id")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("score"))
        .groupBy("doc_id")
        .agg(round_to(F.sum("score"), 4).alias("bm25"))
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        totals.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


def _term_stats(docs: DataFrame):
    """(tf, dl, dfreq, stats) term-statistics frames, tokenizing once."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    return tf, dl, dfreq, stats
