"""mapInArrow — the leanest Python extension seam, demonstrated.

Completes the engine's Python-integration matrix (pandas_udf ✓,
applyInPandas ✓, mapInPandas ✓, applyInPandasWithState ✓, UDTF ✓,
Python DataSource ✓, transformWithState gated on protobuf):
``mapInArrow`` hands the worker raw ``pyarrow.RecordBatch``es with NO
pandas conversion on either side — the right seam when the Python work
is itself Arrow-native (pyarrow.compute kernels, Arrow-IPC shipping to
another system, zero-copy hand-off to a C++ library). Per-batch cost
is serialization only; pandas' per-column boxing (the hidden tax of
mapInPandas on string-heavy data) never happens.

Same warning label as every Python seam here (udtf_ops.py sets the
precedent): token counting IS expressible with JVM builtins — the
oracle recomputes it relationally — so this module is the API
demonstration with a hash-pinned contract, not the production path
for this particular computation.

Scale notes: embarrassingly parallel map over batches, no shuffle, no
state; batch size follows spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import query
from ..sources import load


def _arrow_token_stats(batches):
    """Pure-Arrow per-document stats: UTF-8 byte length and
    single-space token count, via pyarrow.compute kernels only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        n_bytes = pc.binary_length(text).cast(pa.int64())
        # tokens under single-space split = spaces + 1 (matches both
        # Spark split() and DuckDB string_split on non-NULL text;
        # NULL propagates to NULL on every engine)
        n_tokens = pc.add(
            pc.count_substring(text, " ").cast(pa.int64()), pa.scalar(1, pa.int64())
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), n_bytes, n_tokens],
            names=["doc_id", "n_bytes", "n_tokens"],
        )


@query(
    "mapinarrow_token_stats",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
""",
    tags=("extension", "pandas-udf", "F12"),
)
def mapinarrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document UTF-8 byte length and space-token count computed by
    pyarrow.compute kernels inside mapInArrow — value-pinned against
    DuckDB's strlen/string_split over the same corpus."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_token_stats, "doc_id bigint, n_bytes bigint, n_tokens bigint"
    )
