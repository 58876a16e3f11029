"""Streaming incremental dedup: micro-batched ingest probed against a
PERSISTED BUCKETED corpus band index (foreachBatch).

The batch operators in dedup/incremental.py prove the delta-vs-corpus
join; THIS operator runs it the way a production ingest actually
arrives — as a STREAM of document batches — and makes the "stored
corpus index" story executable instead of documented: the corpus's
band index is MATERIALIZED as a bucketed table on (band, band_key)
(the operators/bucketing.py layout), and every micro-batch's
foreachBatch callback probes that stored table as a sort-merge join
in which ONLY the tiny batch side shuffles — the corpus side reads
its buckets in place with zero Exchange (plan captured per batch in
``LAST_PROBE_PLANS`` and asserted in tests/test_plans.py). At 100 TB
the index is written once per compaction cycle and every ingest batch
pays |batch| shuffle cost, never |corpus|. The corpus SHINGLE frame
(consumed by the exact-Jaccard verify stage, keyed by doc_id) stays
session-cached here; bucketing it on doc_id is the same mechanical
recipe.

Equivalence is the oracle: the delta (the FIXED_DELTA_DOCS slice,
same split as `incremental_dedup_fixed_delta`) is staged as one file
per slice and consumed with maxFilesPerTrigger=1, so the decisions
accumulate across several micro-batches — and because each batch
probes the same static corpus and the batches partition the delta,
the UNION of per-batch decisions must equal the batch pipeline's
output exactly. The DuckDB oracle is literally the fixed-delta batch
oracle; matching it proves micro-batching changed nothing.

Per-batch cost is O(|batch| x collision rate) against the stored
index — the stream never rescans the corpus text. Delivery is
at-least-once (foreachBatch's contract); results stay correct under
replay because each batch writes to a DETERMINISTIC per-batch_id
directory with mode=overwrite — a retried batch overwrites its own
partial output instead of appending duplicates, so the union of
batch directories is idempotent."""

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
N_INDEX_BUCKETS = 8  # buckets of the stored corpus band index
_INDEX_TABLE = "stream_corpus_bands"

# batch ids seen by the LAST run's foreachBatch — test seam proving the
# stream really executed several micro-batches (an availableNow stream
# that coalesced everything into one batch would trivially "match")
LAST_BATCH_IDS: list[int] = []
# formatted physical plan of each batch's candidate probe join — test
# seam proving the stored index is read bucketed with no corpus-side
# Exchange (the whole point of persisting it)
LAST_PROBE_PLANS: list[str] = []


def _formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@query(
    "stream_incremental_dedup",
    oracle=_incremental_oracle(_IS_FIXED_DELTA_SQL),
    tags=("streaming", "dedup", "minhash", "cdc"),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-delta ingest dedup run as a STREAM: delta docs staged
    one file per slice, consumed maxFilesPerTrigger=1 (so several
    micro-batches really happen), each batch's shingles/signature/bands
    computed batch-locally and probed against the PERSISTED bucketed
    corpus index, decisions overwritten to a per-batch directory
    (idempotent under replay). Union of batches must hash-match the
    batch pipeline's oracle — micro-batching is equivalence-preserving
    by construction, and this query proves it."""
    docs = load(spark, sf_dir, "documents")
    # corpus shingles feed the verify stage's exact-Jaccard join
    corpus_sh = shingle_rows(
        docs.filter(F.col("doc_id") >= FIXED_DELTA_DOCS)
    ).cache()
    stage = tempfile.mkdtemp(prefix="stream_ingest_")
    in_dir = os.path.join(stage, "in")
    res_dir = os.path.join(stage, "out")
    ckpt_dir = os.path.join(stage, "ckpt")
    idx_dir = os.path.join(stage, "idx")

    def cleanup() -> None:
        spark.sql(f"DROP TABLE IF EXISTS {_INDEX_TABLE}")
        corpus_sh.unpersist()
        shutil.rmtree(stage, ignore_errors=True)

    q = None
    try:
        # --- the stored corpus index: bucketed table on (band, band_key).
        # repartition by the bucket columns first (same Murmur3 hash the
        # bucketing layer uses) so each bucket is ONE file and bucket-sorted
        # reads need no re-sort.
        spark.sql(f"DROP TABLE IF EXISTS {_INDEX_TABLE}")
        (
            _band_rows(_signature(corpus_sh))
            .repartition(N_INDEX_BUCKETS, "band", "band_key")
            .write.bucketBy(N_INDEX_BUCKETS, "band", "band_key")
            .sortBy("band", "band_key")
            .option("path", idx_dir)
            .mode("overwrite")
            .saveAsTable(_INDEX_TABLE)
        )
        corpus_bands = spark.table(_INDEX_TABLE)

        delta = docs.filter(F.col("doc_id") < FIXED_DELTA_DOCS).select(
            "doc_id", "text", F.pmod("doc_id", F.lit(INGEST_SLICES)).alias("slice")
        )
        # one file per slice dir -> maxFilesPerTrigger=1 = one slice/batch
        delta.repartition("slice").write.partitionBy("slice").parquet(in_dir)

        LAST_BATCH_IDS.clear()
        LAST_PROBE_PLANS.clear()

        def probe(batch_df: DataFrame, batch_id: int) -> None:
            LAST_BATCH_IDS.append(batch_id)
            b = batch_df.select("doc_id", "text")
            bsh = shingle_rows(b).cache()  # feeds signature + verify + sizes
            bbands = _band_rows(_signature(bsh)).alias("d")
            # merge hint: at fixture scale the planner would broadcast the
            # tiny batch side (also corpus-exchange-free, but vacuously —
            # it streams the WHOLE index past the hash table); the SMJ
            # against the bucketed layout is the plan that scales, with
            # the batch side alone shuffling into the index's buckets.
            probe_join = bbands.join(
                corpus_bands.alias("c").hint("merge"),
                (F.col("d.band") == F.col("c.band"))
                & (F.col("d.band_key") == F.col("c.band_key")),
            )
            LAST_PROBE_PLANS.append(_formatted_plan(probe_join))
            cand = probe_join.select(
                F.col("d.doc_id").alias("doc_d"), F.col("c.doc_id").alias("doc_c")
            ).distinct()
            out = verify_decisions(cand, bsh, corpus_sh, b.select("doc_id"))
            # deterministic per-batch path + overwrite = idempotent replay
            out.write.mode("overwrite").parquet(
                os.path.join(res_dir, f"b{batch_id}")
            )
            bsh.unpersist()

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
        rows = spark.read.parquet(os.path.join(res_dir, "b*")).collect()
    finally:
        if q is not None and q.isActive:
            q.stop()
        cleanup()
    assert len(rows) == FIXED_DELTA_DOCS, (
        f"stream dropped delta docs: {len(rows)}/{FIXED_DELTA_DOCS}"
    )
    return spark.createDataFrame(
        rows,
        "doc_id bigint, n_corpus_matches bigint, best_match bigint, "
        "best_jaccard double",
    )
