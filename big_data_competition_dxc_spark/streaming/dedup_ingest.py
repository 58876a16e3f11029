"""Streaming incremental dedup: micro-batched ingest probed against a
precomputed corpus band index (foreachBatch).

The batch operators in dedup/incremental.py prove the delta-vs-corpus
join; THIS operator runs it the way a production ingest actually
arrives — as a STREAM of document batches — and makes the "stored
corpus index" story executable instead of documented: the corpus's
band index, shingle frame, and sizes are derived ONCE, cached, and
every micro-batch's foreachBatch callback probes those cached frames
(at warehouse scale they are bucketed tables on (band, band_key); the
probe is then a co-located join with zero corpus-side work beyond the
matched buckets — operators/bucketing.py is that write side).

Equivalence is the oracle: the delta (the FIXED_DELTA_DOCS slice,
same split as `incremental_dedup_fixed_delta`) is staged as one file
per slice and consumed with maxFilesPerTrigger=1, so the decisions
accumulate across several micro-batches — and because each batch
probes the same static corpus and the batches partition the delta,
the UNION of per-batch decisions must equal the batch pipeline's
output exactly. The DuckDB oracle is literally the fixed-delta batch
oracle; matching it proves micro-batching changed nothing.

Per-batch cost is O(|batch| x collision rate) against the cached
index — the stream never rescans the corpus text. Append-mode parquet
results + a checkpoint dir make the sink replay-safe (re-running a
failed batch overwrites nothing already committed by other batches;
exactly-once per batch comes from the standard sink/checkpoint
contract)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.incremental import FIXED_DELTA_DOCS, _IS_FIXED_DELTA_SQL, _incremental_oracle, verify_decisions
from ..dedup.jaccard import shingle_rows
from ..dedup.minhash import _band_rows, _signature
from ..plans.registry import query
from ..sources import load

INGEST_SLICES = 4  # micro-batches the staged delta splits into

# batch ids seen by the LAST run's foreachBatch — test seam proving the
# stream really executed several micro-batches (an availableNow stream
# that coalesced everything into one batch would trivially "match")
LAST_BATCH_IDS: list[int] = []


@query(
    "stream_incremental_dedup",
    oracle=_incremental_oracle(_IS_FIXED_DELTA_SQL),
    tags=("streaming", "dedup", "minhash", "cdc"),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-delta ingest dedup run as a STREAM: delta docs staged
    one file per slice, consumed maxFilesPerTrigger=1 (so several
    micro-batches really happen), each batch's shingles/signature/bands
    computed batch-locally and probed against the cached corpus index,
    decisions appended per batch. Union of batches must hash-match the
    batch pipeline's oracle — micro-batching is equivalence-preserving
    by construction, and this query proves it."""
    docs = load(spark, sf_dir, "documents")
    # --- the "stored corpus index", derived once and cached ---
    corpus_sh = shingle_rows(
        docs.filter(F.col("doc_id") >= FIXED_DELTA_DOCS)
    ).cache()
    corpus_bands = _band_rows(_signature(corpus_sh)).cache()
    corpus_bands.count()  # materialize before the stream starts
    stage = tempfile.mkdtemp(prefix="stream_ingest_")
    in_dir = os.path.join(stage, "in")
    res_dir = os.path.join(stage, "out")
    ckpt_dir = os.path.join(stage, "ckpt")
    delta = docs.filter(F.col("doc_id") < FIXED_DELTA_DOCS).select(
        "doc_id", "text", F.pmod("doc_id", F.lit(INGEST_SLICES)).alias("slice")
    )
    # one file per slice dir -> maxFilesPerTrigger=1 = one slice/batch
    delta.repartition("slice").write.partitionBy("slice").parquet(in_dir)

    LAST_BATCH_IDS.clear()

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        LAST_BATCH_IDS.append(batch_id)
        b = batch_df.select("doc_id", "text")
        bsh = shingle_rows(b).cache()  # feeds signature + verify + sizes
        bbands = _band_rows(_signature(bsh)).alias("d")
        cand = (
            bbands.join(
                corpus_bands.alias("c"),
                (F.col("d.band") == F.col("c.band"))
                & (F.col("d.band_key") == F.col("c.band_key")),
            )
            .select(
                F.col("d.doc_id").alias("doc_d"), F.col("c.doc_id").alias("doc_c")
            )
            .distinct()
        )
        out = verify_decisions(cand, bsh, corpus_sh, b.select("doc_id"))
        out.write.mode("append").parquet(res_dir)
        bsh.unpersist()

    q = None
    try:
        q = (
            spark.readStream.schema("doc_id bigint, text string, slice int")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(probe)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(res_dir).collect()
    finally:
        if q is not None and q.isActive:
            q.stop()
        corpus_bands.unpersist()
        corpus_sh.unpersist()
        shutil.rmtree(stage, ignore_errors=True)
    assert len(rows) == FIXED_DELTA_DOCS, (
        f"stream dropped delta docs: {len(rows)}/{FIXED_DELTA_DOCS}"
    )
    return spark.createDataFrame(
        rows,
        "doc_id bigint, n_corpus_matches bigint, best_match bigint, "
        "best_jaccard double",
    )
