"""Span-corruption (T5-style) seq2seq pretraining pairs.

Denoising pretraining replaces contiguous token spans with sentinel
tokens and asks the model to reproduce the masked content: from each
document it needs (input_text with sentinels, target_text with the
masked spans). Random span selection is irreproducible; here the mask
layout is STRUCTURAL — words group into SPAN_W-word spans, every
MASK_EVERYth span is masked (a fixed 1/MASK_EVERY corruption rate) —
so the pair construction is a pure function of the text and the whole
operator stays inside JVM higher-order array functions (transform /
filter / array_join over one split): no UDF, no Python, one narrow
pass. The k-th masked span's sentinel ordinal is closed-form
((s - 1) div MASK_EVERY for span s), so no ranking window is needed.

DuckDB recomputes the identical construction with list_transform /
list_filter / array_to_string (same integer arithmetic, same split
semantics), pinning both output texts byte-for-byte.

Scale notes (100 TB): linear in corpus characters, zero shuffles, and
the array ops stay in whole-stage codegen — this is the operator
class (per-doc restructuring) where staying JVM-side matters most;
compare udtf_word_chunks' flagged Python UDTF doing strictly less
work per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

SPAN_W = 5  # words per span
MASK_EVERY = 4  # every 4th span masked -> 25% corruption


@query(
    "span_corruption_pairs",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), (x, i) -> {{
           'w': x,
           'sp': (i - 1) // {SPAN_W},
           'first': ((i - 1) % {SPAN_W}) = 0
         }}) AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         array_to_string(list_filter(list_transform(toks, t ->
           CASE
             WHEN t.sp % {MASK_EVERY} <> {MASK_EVERY - 1} THEN t.w
             WHEN t.first THEN '<X' || CAST(t.sp // {MASK_EVERY} AS VARCHAR) || '>'
             ELSE NULL
           END), x -> x IS NOT NULL), ' ') AS input_text,
         -- COALESCE: DuckDB's array_to_string([]) is NULL where
         -- Spark's array_join([]) is '' (docs too short to mask)
         COALESCE(array_to_string(list_filter(list_transform(toks, t ->
           CASE
             WHEN t.sp % {MASK_EVERY} <> {MASK_EVERY - 1} THEN NULL
             WHEN t.first THEN '<X' || CAST(t.sp // {MASK_EVERY} AS VARCHAR) || '>' || ' ' || t.w
             ELSE t.w
           END), x -> x IS NOT NULL), ' '), '') AS target_text,
         len(list_filter(toks, t ->
           t.first AND t.sp % {MASK_EVERY} = {MASK_EVERY - 1})) AS n_masked_spans
  FROM w
)
SELECT doc_id, input_text, target_text, CAST(n_masked_spans AS BIGINT) AS n_masked_spans
FROM m
""",
    tags=("textops", "packing", "F12"),
)
def span_corruption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(input_text, target_text) denoising pairs per document: every
    {MASK_EVERY}th {SPAN_W}-word span replaced by a sentinel in the
    input and emitted (sentinel-prefixed) in the target."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    masked_span = lambda sp: sp % MASK_EVERY == MASK_EVERY - 1  # noqa: E731
    toks = F.transform(
        F.split(F.col("text"), " "),
        lambda x, i: F.struct(
            x.alias("w"),
            (i / SPAN_W).cast("int").alias("sp"),  # i is 0-based here
            (i % SPAN_W == 0).alias("first"),
        ),
    )
    sentinel = lambda t: F.concat(  # noqa: E731
        F.lit("<X"), (t["sp"] / MASK_EVERY).cast("int").cast("string"), F.lit(">")
    )
    input_text = F.array_join(
        F.filter(
            F.transform(
                toks,
                lambda t: F.when(~masked_span(t["sp"]), t["w"]).when(
                    t["first"], sentinel(t)
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    target_text = F.array_join(
        F.filter(
            F.transform(
                toks,
                lambda t: F.when(
                    masked_span(t["sp"]) & t["first"],
                    F.concat(sentinel(t), F.lit(" "), t["w"]),
                ).when(masked_span(t["sp"]), t["w"]),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    n_masked = F.size(
        F.filter(toks, lambda t: t["first"] & masked_span(t["sp"]))
    ).cast("bigint")
    # COALESCE mirrors the oracle's: DuckDB's array_to_string is NULL
    # for both the empty list (short docs) AND a NULL text, and the
    # oracle maps both to '' — a NULL-text row must not diverge.
    return docs.select(
        "doc_id",
        input_text.alias("input_text"),
        F.coalesce(target_text, F.lit("")).alias("target_text"),
        n_masked.alias("n_masked_spans"),
    )
