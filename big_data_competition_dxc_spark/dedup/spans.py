"""Span-level exact-substring deduplication over ``documents``.

The doc-level dedup family (dedup/exact.py, dedup/minhash.py) treats a
document as the dedup unit; this module finds duplicated SPANS — fixed-
length token windows repeated across documents — the signal behind
exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better": their suffix-array pass
finds 50-token repeats; the distributed-friendly equivalent is rolling
k-gram fingerprints, which is what we compute). Extends the reference's
whole-record duplicate handling (流行音乐趋势预测.md:42 ``select
distinct *`` over raw user actions; SURVEY.md §2.12 dedup ladder) from
whole records to sub-document spans.

Scale path (100 TB): the span table is token-count-sized — one row per
k-gram, produced scan-side by a JVM ``transform``+``explode`` with no
Python in the loop — and it shuffles exactly ONCE, into a (fp, doc_id,
occurrences) pre-aggregation with map-side combine. Every downstream
quantity (document reach, duplicated-fingerprint set, per-doc coverage)
is a plain count/sum over that pair table, so no COUNT DISTINCT ever
runs an Expand over the raw span table (the Expand plan measured 1.5x
slower at sf1) and no single reducer sees
a hot boilerplate key's full occurrence list — the pair table bounds a
hot fp to one row per touching document, and AQE skew-join covers the
dup-set join. Never a pair join, never the text payload past the first
projection. In production the md5 would drop to a 64-bit xxhash to
halve shuffle width; md5 keeps the DuckDB oracle byte-identical here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

#: Tokens per span. Lee et al. use 50-token windows on web-scale text;
#: the synthetic fixture docs are 10-99 words from a small vocabulary,
#: so 8 keeps a realistic duplicated tail (~1.1k cross-doc fingerprints
#: at sf0.001) without degenerating to every-window-matches.
SPAN_TOKENS = 8

#: Rows in the duplicated-span hotlist.
HOTSPOT_TOP_K = 20


def span_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) — one row per rolling SPAN_TOKENS-gram, md5-hashed.

    The ``when`` guard matters: Spark's ``sequence(1, n)`` with n < 1
    yields a DESCENDING sequence ([1, 0]), not an empty one, so docs
    shorter than SPAN_TOKENS must short-circuit to an empty array
    (DuckDB's ``range`` is empty there, and the engines must agree)."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    spans = F.when(
        F.size("w") >= SPAN_TOKENS,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - SPAN_TOKENS + 1),
            lambda i: F.array_join(F.slice("w", i, SPAN_TOKENS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", words.alias("w"))
        .select("doc_id", F.explode(spans).alias("span"))
        .select("doc_id", F.md5("span").alias("fp"))
    )


def span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fp, doc_id, c) — the load-bearing pre-aggregation both queries
    share: the raw span table shuffles exactly once, and every
    downstream count-distinct becomes a plain count/sum over this pair
    table — no COUNT DISTINCT ever runs an Expand over the raw span
    table (the Expand plan measured 1.5x slower at sf1)."""
    return (
        span_fingerprints(spark, sf_dir)
        .groupBy("fp", "doc_id")
        .agg(F.count("*").alias("c"))
    )


#: Shared oracle CTE: the k-gram span table (DuckDB list slicing is
#: inclusive-end, hence i:i+K-1; range() is empty when len < K).
_SQL_SPANS = f"""
w AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS words
  FROM documents
),
s AS (
  SELECT doc_id,
         md5(array_to_string(words[i:i+{SPAN_TOKENS}-1], ' ')) AS fp
  FROM w, UNNEST(range(1, len(words) - {SPAN_TOKENS} + 2)) AS t(i)
)
"""


@query(
    "substring_span_dedup",
    oracle=f"""
WITH {_SQL_SPANS},
dup AS (SELECT fp FROM s GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2),
tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM s GROUP BY doc_id),
d AS (
  SELECT s.doc_id, COUNT(*) AS n_dup_occ, COUNT(DISTINCT s.fp) AS n_dup_fps
  FROM s JOIN dup USING (fp) GROUP BY s.doc_id
)
SELECT tot.doc_id, tot.n_spans,
       COALESCE(d.n_dup_occ, 0) AS n_dup_occ,
       COALESCE(d.n_dup_fps, 0) AS n_dup_fps,
       {sql_round("COALESCE(d.n_dup_occ, 0) * 1.0 / tot.n_spans", 4)} AS dup_frac
FROM tot LEFT JOIN d USING (doc_id)
""",
    tags=("dedup", "spans", "llm-pipeline"),
)
def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: how much of each document
    is made of {SPAN_TOKENS}-token windows that also appear in ANOTHER
    document. ``dup_frac`` is the span-level duplication rate — the
    quantity exact-substring dedup would remove. Docs shorter than
    {SPAN_TOKENS} tokens contribute no spans and drop out (matching the
    empty range() on the oracle side)."""
    pairs = span_pairs(spark, sf_dir)
    dup_fps = (
        pairs.groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("fp")
    )
    per_doc = pairs.groupBy("doc_id").agg(F.sum("c").alias("n_spans"))
    per_dup = (
        pairs.join(dup_fps, "fp")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_dup_occ"),
            F.count("*").alias("n_dup_fps"),
        )
    )
    n_dup_occ = F.coalesce("n_dup_occ", F.lit(0))
    return per_doc.join(per_dup, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        n_dup_occ.alias("n_dup_occ"),
        F.coalesce("n_dup_fps", F.lit(0)).alias("n_dup_fps"),
        round_to(n_dup_occ / F.col("n_spans"), 4).alias("dup_frac"),
    )


@query(
    "substring_span_hotspots",
    oracle=f"""
WITH {_SQL_SPANS},
per_fp AS (
  SELECT fp, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
  FROM s GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
),
r AS (
  SELECT fp, n_docs, n_occ,
         CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, fp)
              AS BIGINT) AS rn
  FROM per_fp
)
SELECT fp, n_docs, n_occ, rn FROM r WHERE rn <= {HOTSPOT_TOP_K}
""",
    tags=("dedup", "spans", "llm-pipeline"),
)
def substring_span_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {HOTSPOT_TOP_K} most-widespread duplicated spans (boilerplate
    hotlist) — the actionable artifact of span dedup: strip these first.
    Deterministic order: document reach desc, occurrences desc, fp.
    Top-k via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    the full duplicated-fp set never sorts globally); the rank column is
    attached by a window over the already-materialized {HOTSPOT_TOP_K}
    rows, not the corpus."""
    from pyspark.sql import Window

    per_fp = (
        span_pairs(spark, sf_dir)
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("c").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    order = [F.desc("n_docs"), F.desc("n_occ"), F.asc("fp")]
    top = per_fp.orderBy(*order).limit(HOTSPOT_TOP_K)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w).cast("bigint")).select(
        "fp", "n_docs", "n_occ", "rn"
    )
