"""Streaming incremental dedup: micro-batched ingest probed against a
PERSISTED BUCKETED corpus index (foreachBatch) — both halves of it.

The batch operators in dedup/incremental.py prove the delta-vs-corpus
join; THIS operator runs it the way a production ingest actually
arrives — as a STREAM of document batches — and makes the "stored
corpus index" story executable instead of documented. The corpus is
materialized as TWO bucketed tables (the operators/bucketing.py
layout), each serving one stage of the per-batch probe:

1. ``stream_corpus_bands`` — the LSH band index, bucketed+sorted on
   (band, band_key). Every micro-batch's candidate probe is a
   sort-merge join in which ONLY the tiny batch side shuffles — the
   corpus side reads its buckets in place with zero Exchange (plan
   captured per batch in ``LAST_PROBE_PLANS``, asserted in
   tests/test_plans.py).
2. ``stream_corpus_shingles`` — the exploded shingle rows the
   exact-Jaccard verify stage reads, bucketed+sorted on doc_id. This
   is the HEAVY half (full text volume); the verify stage only ever
   needs the shingles of the corpus docs that actually collided with
   the batch, so each batch collects its matched doc_id set (tiny:
   O(|batch| x collision rate)) and pushes it into the scan as an
   IN-list — bucket-filter pruning reads ONLY the buckets those ids
   hash into (SelectedBucketsCount in the plan, captured per batch in
   ``LAST_VERIFY_PLANS``). Per-batch corpus-text touch is
   O(matched docs), never O(corpus). Building the band index FROM the
   shingle table is itself exchange-free: the signature groupBy's key
   is the table's bucket key.

At 100 TB both tables are written once per compaction cycle and every
ingest batch pays |batch| shuffle cost plus a few pruned bucket reads,
never |corpus|. The matched-id collect is bounded by the batch's
collision count (kilobytes); if a pathological batch matched more than
``MAX_PRUNE_IDS`` corpus docs the probe falls back to the unpruned
bucketed scan rather than building a megabyte IN-list.

Equivalence is the oracle: the delta (the FIXED_DELTA_DOCS slice,
same split as `incremental_dedup_fixed_delta`) is staged as one file
per slice and consumed with maxFilesPerTrigger=1, so the decisions
accumulate across several micro-batches — and because each batch
probes the same static corpus and the batches partition the delta,
the UNION of per-batch decisions must equal the batch pipeline's
output exactly. The DuckDB oracle is literally the fixed-delta batch
oracle; matching it proves micro-batching (and the pruned verify
path) changed nothing. Delivery is at-least-once (foreachBatch's
contract); results stay correct under replay because each batch
writes to a DETERMINISTIC per-batch_id directory with mode=overwrite
— a retried batch overwrites its own partial output instead of
appending duplicates, so the union of batch directories is
idempotent."""

from __future__ import annotations

import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.incremental import FIXED_DELTA_DOCS, _IS_FIXED_DELTA_SQL, _incremental_oracle, verify_decisions
from ..dedup.jaccard import shingle_rows
from ..dedup.minhash import _band_rows, _signature
from ..ml.concurrency import run_concurrently
from ..plans.registry import query
from ..sources import load

INGEST_SLICES = 4  # micro-batches the staged delta splits into
N_INDEX_BUCKETS = 8  # buckets of the stored corpus band index
N_SHINGLE_BUCKETS = 16  # buckets of the stored corpus shingle table
# above this many matched corpus ids, skip the IN-list and scan unpruned
MAX_PRUNE_IDS = 10_000
_INDEX_TABLE = "stream_corpus_bands"
_SHINGLE_TABLE = "stream_corpus_shingles"

# batch ids seen by the LAST run's foreachBatch — test seam proving the
# stream really executed several micro-batches (an availableNow stream
# that coalesced everything into one batch would trivially "match")
LAST_BATCH_IDS: list[int] = []
# formatted physical plan of each batch's candidate probe join — test
# seam proving the stored band index is read bucketed with no
# corpus-side Exchange (the whole point of persisting it)
LAST_PROBE_PLANS: list[str] = []
# formatted physical plan of each batch's PRUNED verify-side shingle
# scan (recorded only for batches with >=1 matched corpus doc) — test
# seam proving SelectedBucketsCount < N_SHINGLE_BUCKETS
LAST_VERIFY_PLANS: list[str] = []


_PLAN_CAPTURE_LOCK = threading.Lock()


def _formatted_plan(df: DataFrame) -> str:
    """Formatted physical plan via the PUBLIC API only: capture the
    stdout of ``df.explain(mode="formatted")`` instead of reaching into
    ``_jdf``/``_jvm`` py4j internals (which drift across releases and
    don't exist under Spark Connect).

    ``redirect_stdout`` swaps the PROCESS-GLOBAL ``sys.stdout``, and
    this runs inside streaming ``foreachBatch`` — a concurrent thread
    printing during the capture window would have its output swallowed
    into the plan buffer (or plan text could leak onto real stdout,
    breaking bench's one-JSON-line contract). Batches are sequential
    today, so the module lock is cheap insurance, not a hot path
    (r8 advice)."""
    import contextlib
    import io

    buf = io.StringIO()
    with _PLAN_CAPTURE_LOCK, contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@query(
    "stream_incremental_dedup",
    oracle=_incremental_oracle(_IS_FIXED_DELTA_SQL),
    tags=("streaming", "dedup", "minhash", "cdc"),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-delta ingest dedup run as a STREAM: delta docs staged
    one file per slice, consumed maxFilesPerTrigger=1 (so several
    micro-batches really happen), each batch's shingles/signature/bands
    computed batch-locally, candidates probed against the PERSISTED
    bucketed band index, exact-Jaccard verified against the PERSISTED
    bucketed shingle table pruned to the batch's matched doc_ids,
    decisions overwritten to a per-batch directory (idempotent under
    replay). Union of batches must hash-match the batch pipeline's
    oracle — micro-batching is equivalence-preserving by construction,
    and this query proves it."""
    docs = load(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="stream_ingest_")
    in_dir = os.path.join(stage, "in")
    res_dir = os.path.join(stage, "out")
    ckpt_dir = os.path.join(stage, "ckpt")
    idx_dir = os.path.join(stage, "idx")
    sh_dir = os.path.join(stage, "sh")

    # bucket-FILTER pruning needs autoBucketedScan scoped OFF: the auto
    # heuristic keeps bucketed reads only for join/agg partitioning
    # benefits and is blind to IN-list scan pruning (see
    # operators/bucketing.py:bucket_pruned_scan_frames). Restored in
    # cleanup(); the whole stream plans AND executes inside the scope.
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_auto = spark.conf.get(auto_key, "true")

    def cleanup() -> None:
        spark.conf.set(auto_key, old_auto)
        spark.sql(f"DROP TABLE IF EXISTS {_INDEX_TABLE}")
        spark.sql(f"DROP TABLE IF EXISTS {_SHINGLE_TABLE}")
        shutil.rmtree(stage, ignore_errors=True)

    q = None
    spark.conf.set(auto_key, "false")
    try:
        # The corpus-index build chain and the delta staging write are
        # INDEPENDENT jobs — overlap them (guide §2.6) so the staging
        # write back-fills the build stages' tails. The build chain
        # itself is sequential by data dependency (band index and size
        # table both derive FROM the stored shingle table).
        def _build_corpus() -> tuple[DataFrame, DataFrame, DataFrame]:
            # --- stored table 1: corpus shingles, bucketed on doc_id.
            # The verify stage's per-batch reads prune to matched ids;
            # building the band index below reads it ONCE,
            # exchange-free (groupBy on the bucket key).
            spark.sql(f"DROP TABLE IF EXISTS {_SHINGLE_TABLE}")
            (
                shingle_rows(docs.filter(F.col("doc_id") >= FIXED_DELTA_DOCS))
                .repartition(N_SHINGLE_BUCKETS, "doc_id")
                .write.bucketBy(N_SHINGLE_BUCKETS, "doc_id")
                .sortBy("doc_id")
                .option("path", sh_dir)
                .mode("overwrite")
                .saveAsTable(_SHINGLE_TABLE)
            )
            tbl = spark.table(_SHINGLE_TABLE)

            # --- stored table 2: the band index, bucketed on
            # (band, band_key). repartition by the bucket columns first
            # (same Murmur3 hash the bucketing layer uses) so each
            # bucket is ONE file and bucket-sorted reads need no
            # re-sort.
            spark.sql(f"DROP TABLE IF EXISTS {_INDEX_TABLE}")
            (
                _band_rows(_signature(tbl))
                .repartition(N_INDEX_BUCKETS, "band", "band_key")
                .write.bucketBy(N_INDEX_BUCKETS, "band", "band_key")
                .sortBy("band", "band_key")
                .option("path", idx_dir)
                .mode("overwrite")
                .saveAsTable(_INDEX_TABLE)
            )
            # --- stored property 3: per-doc shingle counts — derived
            # once at index-build time (exchange-free: groupBy on the
            # shingle table's bucket key) and materialized tiny
            # (|corpus docs| rows), so each micro-batch's verify skips
            # a second aggregation pass over its pruned corpus scan.
            sizes = (
                tbl.groupBy("doc_id")
                .agg(F.count("*").alias("n"))
                .localCheckpoint(eager=True)
            )
            return tbl, spark.table(_INDEX_TABLE), sizes

        def _stage_delta() -> None:
            delta = docs.filter(F.col("doc_id") < FIXED_DELTA_DOCS).select(
                "doc_id", "text", F.pmod("doc_id", F.lit(INGEST_SLICES)).alias("slice")
            )
            # one file per slice dir -> maxFilesPerTrigger=1 = one slice/batch
            delta.repartition("slice").write.partitionBy("slice").parquet(in_dir)

        (corpus_sh_tbl, corpus_bands, corpus_sizes), _ = run_concurrently(
            [_build_corpus, _stage_delta], spark
        )

        LAST_BATCH_IDS.clear()
        LAST_PROBE_PLANS.clear()
        LAST_VERIFY_PLANS.clear()

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
            cand = (
                probe_join.select(
                    F.col("d.doc_id").alias("doc_d"), F.col("c.doc_id").alias("doc_c")
                )
                .distinct()
                .cache()  # consumed twice: matched-id collect + verify join
            )
            try:
                # the batch's matched corpus docs — bounded by the batch's
                # collision count, the dynamic filter the verify scan prunes
                # buckets with. This collect is the probe result itself
                # (O(|batch| x collisions)), not a corpus-sized pull.
                matched = [
                    r[0] for r in cand.select("doc_c").distinct().collect()
                ]
                if not matched:
                    corpus_side = corpus_sh_tbl.filter(F.lit(False))
                elif len(matched) <= MAX_PRUNE_IDS:
                    corpus_side = corpus_sh_tbl.filter(
                        F.col("doc_id").isin(*matched)
                    )
                    LAST_VERIFY_PLANS.append(_formatted_plan(corpus_side))
                else:  # pathological collision storm: unpruned bucketed scan
                    corpus_side = corpus_sh_tbl
                out = verify_decisions(
                    cand, bsh, corpus_side, b.select("doc_id"),
                    sizes_c=corpus_sizes,
                )
                # deterministic per-batch path + overwrite = idempotent replay
                out.write.mode("overwrite").parquet(
                    os.path.join(res_dir, f"b{batch_id}")
                )
            finally:
                cand.unpersist()
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
