"""Cross-document boilerplate removal (CCNet/RefinedWeb-style line
dedup, adapted to the fixture's single-line documents).

Web-scale pretraining pipelines drop LINES that recur across many
documents (navigation bars, cookie banners, license footers) before
any document-level dedup — per CCNet's paragraph-hash dedup and
RefinedWeb's line-wise filtering. The fixture corpus has no newlines,
so the unit is a SEGMENT: consecutive non-overlapping 10-word windows,
which is exactly how paragraph-level dedup degrades when documents are
single-line (reference surface: the corpus-hygiene side of the music
pipelines' preprocessing, 流行音乐趋势预测.md:21-33 — dirty-row
removal before modeling; this operator is the corpus-level analogue).

100 TB posture: the segment explode is a bounded x(len/10) row fanout
with no shuffle; the boilerplate census is one hash aggregation on
seg_text (a production variant would aggregate on xxhash64(seg_text)
and carry the 8-byte key through the anti-join — noted, not needed at
fixture scale); the anti-join's build side is only the >=2-doc
repeater set, which AQE plans as a broadcast once its size is known;
reassembly is one groupBy(doc_id) with an array_sort over (seg_idx,
text) structs — no window, no driver state. Everything is built-in
JVM expressions; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

_SEG_WORDS = 10
_MIN_DOCS = 2


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg, seg_text): non-overlapping 10-word windows.

    Built by exploding a 0..n_segs-1 index sequence and slicing the
    pre-split word array — one exploded row per SEGMENT (not per word),
    so the fanout is ~len/10, an order of magnitude cheaper than a
    per-word posexplode + re-group."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_segs = F.ceil(F.size(words) / F.lit(float(_SEG_WORDS))).cast("int")
    return (
        docs.select(
            "doc_id",
            words.alias("words"),
            F.explode(F.sequence(F.lit(0), n_segs - F.lit(1))).alias("seg"),
        )
        .select(
            "doc_id",
            "seg",
            F.concat_ws(
                " ", F.slice(F.col("words"), F.col("seg") * _SEG_WORDS + 1, _SEG_WORDS)
            ).alias("seg_text"),
        )
    )


_SEG_SQL = f"""
  SELECT doc_id, CAST(floor((pos - 1) / {_SEG_WORDS}) AS INT) AS seg,
         string_agg(word, ' ' ORDER BY pos) AS seg_text
  FROM (SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents)
  GROUP BY doc_id, CAST(floor((pos - 1) / {_SEG_WORDS}) AS INT)
"""


@query(
    "boilerplate_segments",
    oracle=f"""
WITH segs AS ({_SEG_SQL})
SELECT seg_text, COUNT(DISTINCT doc_id) AS ndocs, COUNT(*) AS n_occurrences
FROM segs
GROUP BY seg_text
HAVING COUNT(DISTINCT doc_id) >= {_MIN_DOCS}
""",
    tags=("A8", "P7", "dedup"),
)
def boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate census: every 10-word segment that appears in at
    least two distinct documents, with its document reach and raw
    occurrence count. One explode + one hash aggregation; the DISTINCT
    doc count partial-aggregates map-side on (seg_text, doc_id)."""
    return (
        _segments(spark, sf_dir)
        .groupBy("seg_text")
        .agg(
            F.count_distinct("doc_id").alias("ndocs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("ndocs") >= _MIN_DOCS)
    )


@query(
    "boilerplate_scrubbed_docs",
    oracle=f"""
WITH segs AS ({_SEG_SQL}),
boiler AS (
  SELECT seg_text FROM segs GROUP BY seg_text
  HAVING COUNT(DISTINCT doc_id) >= {_MIN_DOCS}
),
kept AS (
  SELECT s.doc_id, s.seg, s.seg_text FROM segs s
  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.seg_text = s.seg_text)
),
per_doc AS (
  SELECT doc_id, string_agg(seg_text, ' ' ORDER BY seg) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.clean_text, '') AS clean_text,
       CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(CAST(ceil(len(string_split(d.text, ' ')) / {_SEG_WORDS}.0) AS BIGINT)
            - COALESCE(p.n_kept, 0) AS BIGINT) AS n_dropped
FROM documents d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
    tags=("J8", "A1", "dedup"),
)
def boilerplate_scrubbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with cross-corpus boilerplate segments removed: every
    doc survives (docs that were ALL boilerplate come back as empty
    text with n_kept=0 — the left join from the full document set
    preserves them, matching how a real pipeline keeps the row for
    audit and filters on n_kept downstream). Reassembly re-orders the
    surviving segments by their original index via array_sort over
    (seg, text) structs — order restored without a window function."""
    segs = _segments(spark, sf_dir)
    boiler = (
        segs.groupBy("seg_text")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= _MIN_DOCS)
        .select("seg_text")
    )
    kept = segs.join(boiler, "seg_text", "left_anti")
    per_doc = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "seg_text"))),
                lambda x: x.seg_text,
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_segs = F.ceil(
        F.size(F.split(F.col("text"), " ")) / F.lit(float(_SEG_WORDS))
    ).cast("bigint")
    return (
        docs.join(per_doc, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
            (n_segs - F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint"))).alias(
                "n_dropped"
            ),
        )
    )
