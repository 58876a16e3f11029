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

from pyspark.sql import Column, DataFrame, SparkSession
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


def _words(col: str = "text") -> Column:
    """Whitespace-normalized token array — the ONE tokenization shared
    by every query in this module (and mirrored token-for-token in the
    oracles' ``string_split(regexp_replace(trim(..)))``)."""
    return F.split(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "), " ")


def spans_of(docs: DataFrame) -> DataFrame:
    """(doc_id, i, fp) over an ARBITRARY (doc_id, text) frame — the
    rolling-k-gram expression behind :func:`span_starts`, factored so
    compositions (textops/release.py scrubs the post-exact-dedup keeper
    set, not the raw table) share the one span definition.

    The ``when`` guard matters: Spark's ``sequence(1, n)`` with n < 1
    yields a DESCENDING sequence ([1, 0]), not an empty one, so docs
    shorter than SPAN_TOKENS must short-circuit to an empty array
    (DuckDB's ``range`` is empty there, and the engines must agree)."""
    spans = F.when(
        F.size("w") >= SPAN_TOKENS,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - SPAN_TOKENS + 1),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.array_join(F.slice("w", i, SPAN_TOKENS), " ")).alias(
                    "fp"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,fp:string>>"))
    return (
        docs.select("doc_id", _words().alias("w"))
        .select("doc_id", F.explode(spans).alias("s"))
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.fp").alias("fp"))
    )


def span_starts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, fp) — one row per rolling SPAN_TOKENS-gram of the
    ``documents`` table with its 1-based start position, md5-hashed
    (see :func:`spans_of` for the expression)."""
    return spans_of(load(spark, sf_dir, "documents"))


def span_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) — the position-free view of :func:`span_starts`
    (Catalyst prunes the unused position column out of the scan-side
    projection)."""
    return span_starts(spark, sf_dir).select("doc_id", "fp")


def span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fp, doc_id, c) — the load-bearing pre-aggregation every query
    in this module shares: the raw span table shuffles exactly once, and every
    downstream count-distinct becomes a plain count/sum over this pair
    table — no COUNT DISTINCT ever runs an Expand over the raw span
    table (the Expand plan measured 1.5x slower at sf1)."""
    return (
        span_fingerprints(spark, sf_dir)
        .groupBy("fp", "doc_id")
        .agg(F.count("*").alias("c"))
    )


def dup_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fp) — the cross-document duplicated-fingerprint set: spans whose
    fingerprint appears in >= 2 distinct documents. The load-bearing
    dup-set DEFINITION, factored once (mirrors the oracle side's
    ``dup`` CTE) so the dedup report and the position-aware
    scrub/islands upstream can never drift apart. Derived from the
    shared ``span_pairs`` pre-agg: a plain count over (fp, doc_id) rows,
    no COUNT DISTINCT Expand."""
    return (
        span_pairs(spark, sf_dir)
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("fp")
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
    per_doc = pairs.groupBy("doc_id").agg(F.sum("c").alias("n_spans"))
    per_dup = (
        pairs.join(dup_fps(spark, sf_dir), "fp")
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


#: Shared oracle CTE chain for the position-aware queries: non-NULL
#: docs, positional spans, the cross-doc dup set, and the DISTINCT
#: covered positions per document.
_SQL_COV = f"""
w AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS words
  FROM documents
  WHERE text IS NOT NULL
),
s AS (
  SELECT doc_id, i,
         md5(array_to_string(words[i:i+{SPAN_TOKENS}-1], ' ')) AS fp
  FROM w, UNNEST(range(1, len(words) - {SPAN_TOKENS} + 2)) AS t(i)
),
dup AS (SELECT fp FROM s GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT s.doc_id, u.j
  FROM s JOIN dup USING (fp), UNNEST(range(s.i, s.i + {SPAN_TOKENS})) AS u(j)
)
"""


def _docs_with_dup_starts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w, dup_starts) — every non-NULL-text document's token
    array left-joined with the collected start positions of its spans
    that duplicate across documents. The shared upstream of the scrub
    and islands queries: dup-fp set from the ``span_pairs`` pre-agg,
    ONE per-document array after the fp join — everything downstream
    is per-row JVM higher-order functions."""
    covered = (
        span_starts(spark, sf_dir)
        .join(dup_fps(spark, sf_dir), "fp")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("dup_starts"))
    )
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select("doc_id", _words().alias("w")).join(
        covered, "doc_id", "left"
    )


@query(
    "substring_span_scrub",
    oracle=f"""
WITH {_SQL_COV},
tok AS (
  SELECT w.doc_id, t.j, w.words[t.j] AS word
  FROM w, UNNEST(range(1, len(w.words) + 1)) AS t(j)
)
SELECT tok.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(cov.j) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN cov.j IS NULL THEN tok.word END,
                           ' ' ORDER BY tok.j), '') AS text_scrubbed
FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.j = tok.j
GROUP BY tok.doc_id
""",
    tags=("dedup", "spans", "llm-pipeline"),
)
def substring_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable artifact of span dedup: each document's text with
    every token covered by a CROSS-DOCUMENT duplicated span removed —
    Lee et al. 2022's exact-substring scrub (their suffix-array pass
    deletes one copy; the k-gram approximation here removes all covered
    positions, the conservative variant boilerplate removal wants).
    One row per non-NULL-text document: token count, removed-token
    count, and the scrubbed text (whitespace-normalized — the rejoin
    uses single spaces, same as the tokenization). Docs shorter than
    {SPAN_TOKENS} tokens, and docs whose spans are all unique, pass
    through untouched with n_removed = 0.

    Scale shape: the dup-fp set comes from the shared ``span_pairs``
    pre-agg (one shuffle); the positional span stream joins it on fp
    (AQE-covered equi-join) and collapses to ONE small array per
    document (dup span starts — bounded by tokens/doc). The covered-
    position expansion, token filtering, and text rebuild are all
    per-row JVM higher-order functions on the document table — no
    pair joins, no per-token shuffle, and the text payload crosses
    exactly one broadcast-or-hash join."""
    joined = _docs_with_dup_starts(spark, sf_dir)
    starts = F.coalesce("dup_starts", F.array().cast("array<int>"))
    cov = F.array_distinct(
        F.flatten(
            F.transform(starts, lambda s: F.sequence(s, s + SPAN_TOKENS - 1))
        )
    )
    # array_except preserves first-array order, so positions stay
    # ascending and the rejoin reconstructs the original token order.
    keep_pos = F.array_except(F.sequence(F.lit(1), F.size("w")), cov)
    return joined.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size(cov).cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(keep_pos, lambda p: F.element_at(F.col("w"), p)), " "
        ).alias("text_scrubbed"),
    )


@query(
    "substring_span_islands",
    oracle=f"""
WITH {_SQL_COV},
isl AS (
  SELECT doc_id, j,
         j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS grp
  FROM cov
),
runs AS (SELECT doc_id, grp, COUNT(*) AS run_len FROM isl GROUP BY doc_id, grp),
per AS (
  SELECT doc_id,
         SUM(run_len) AS n_covered,
         COUNT(*) AS n_islands,
         MAX(run_len) AS max_run
  FROM runs GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(COALESCE(per.n_covered, 0) AS BIGINT) AS n_covered,
       CAST(COALESCE(per.n_islands, 0) AS BIGINT) AS n_islands,
       CAST(COALESCE(per.max_run, 0) AS BIGINT) AS max_run
FROM w LEFT JOIN per USING (doc_id)
""",
    tags=("dedup", "spans", "llm-pipeline", "W4"),
)
def substring_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplicated-region PROFILE behind the scrub: per document,
    how many token positions sit under cross-document duplicated
    spans (n_covered), in how many contiguous runs (n_islands), and
    the longest run (max_run — the 'longest exact duplicate substring'
    length Lee et al. report; >= {SPAN_TOKENS} whenever any span
    duplicates). A doc whose max_run barely exceeds {SPAN_TOKENS} has
    scattered boilerplate; max_run near n_tokens means the document is
    a wholesale copy.

    Scale shape: identical upstream to the scrub (one span_pairs
    shuffle + the fp join + one per-doc array), then the run detection
    is a per-row JVM ``aggregate`` fold over the SORTED covered-
    position array — no per-position rows ever shuffle, no window over
    the corpus. The oracle computes the same runs with the classic
    gaps-and-islands window instead, so the two engines cross-check
    the fold against an independent formulation."""
    joined = _docs_with_dup_starts(spark, sf_dir)
    starts = F.coalesce("dup_starts", F.array().cast("array<int>"))
    cov = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(
                    starts, lambda s: F.sequence(s, s + SPAN_TOKENS - 1)
                )
            )
        )
    )
    fold = F.aggregate(
        cov,
        F.struct(
            F.lit(-2).alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("mx"),
            F.lit(0).alias("n"),
        ),
        lambda acc, j: F.struct(
            j.alias("prev"),
            F.when(j == acc["prev"] + 1, acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(j == acc["prev"] + 1, acc["run"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("mx"),
            (
                acc["n"] + F.when(j == acc["prev"] + 1, 0).otherwise(1)
            ).alias("n"),
        ),
    )
    return joined.select(
        "doc_id",
        F.size(cov).cast("bigint").alias("n_covered"),
        fold["n"].cast("bigint").alias("n_islands"),
        fold["mx"].cast("bigint").alias("max_run"),
    )
