"""Context-window chunking — the step that turns curated documents
into training-window-sized pieces (complementing textops/packing.py,
which packs already-sized pieces into batches).

Fixed-size character windows with overlap (stride = CHUNK_SIZE -
OVERLAP): chunk i covers [i*stride, i*stride + CHUNK_SIZE). Expressed
entirely as JVM array expressions — sequence() builds the start
offsets, transform() + substring() cuts the windows, posexplode keeps
the ordinal — so chunking never leaves whole-stage codegen and scales
linearly with corpus characters. (A Python UDTF could express the
same thing; it would move every character through Arrow for an
operation substring() does in place — the exact anti-pattern the
UDF policy exists to prevent.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

CHUNK_SIZE = 80
OVERLAP = 20
STRIDE = CHUNK_SIZE - OVERLAP

_CHUNK_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents
  WHERE length(text) > 0
), chunks AS (
  SELECT doc_id,
         CAST(unnest(range(0, CAST(ceil(
           GREATEST(CAST(n - {OVERLAP} AS DOUBLE), 1.0) / {STRIDE}
         ) AS BIGINT))) AS INT) AS chunk_idx,
         text, n
  FROM docs
)
SELECT doc_id, chunk_idx,
       substr(text, chunk_idx * {STRIDE} + 1, {CHUNK_SIZE}) AS chunk,
       CAST(LEAST(CAST({CHUNK_SIZE} AS BIGINT),
                  n - chunk_idx * {STRIDE}) AS INT) AS chunk_len
FROM chunks
"""


@query("text_chunk_windows", oracle=_CHUNK_ORACLE, tags=("textops", "chunking"))
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {CHUNK_SIZE}-char windows with {OVERLAP}-char
    overlap per document: (doc_id, chunk_idx, chunk, chunk_len) rows.
    The chunk count per doc is ceil(max(n - overlap, 1) / stride), so
    the final window always reaches the end of the document and short
    documents yield exactly one chunk."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("n"))
        .filter(F.col("n") > 0)
    )
    n_chunks = F.ceil(
        F.greatest((F.col("n") - F.lit(OVERLAP)).cast("double"), F.lit(1.0))
        / F.lit(STRIDE)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return docs.select(
        "doc_id",
        F.posexplode(starts).alias("pos", "chunk_idx"),
        "text",
        "n",
    ).select(
        "doc_id",
        "chunk_idx",
        F.substring(
            F.col("text"), F.col("chunk_idx") * STRIDE + 1, CHUNK_SIZE
        ).alias("chunk"),
        F.least(
            F.lit(CHUNK_SIZE).cast("bigint"),
            F.col("n") - F.col("chunk_idx").cast("bigint") * STRIDE,
        )
        .cast("int")
        .alias("chunk_len"),
    )
