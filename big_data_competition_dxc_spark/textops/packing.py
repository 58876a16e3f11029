"""Training-batch assembly: sequence packing, domain mixing, sharding.

The last mile of a pre-training data pipeline, after filtering and
dedup:

- ``sequence_packing``: concatenate documents in a deterministic
  order and cut the stream into fixed context windows (CTX tokens);
  report per-window fill. Packing is done WITHIN deterministic shards
  (hash of doc_id), so the window function is partitioned — no global
  single-partition sort at 100 TB; each shard packs independently in
  parallel, which is exactly how multi-worker tokenizer jobs shard.
- ``domain_mixing_weights``: per-language target sampling rates
  applied via the portable md5 threshold — the data-mixture step
  (e.g. upweight wiki, downsample web). Deterministic: the same rows
  are kept on any engine/run/cluster layout.
- ``training_shard_assignment``: the deterministic global shuffle —
  order by content hash, deal into N output shards; per-shard doc and
  token counts prove balance. At scale this is a hash-partitioned
  write (one shuffle, no global sort).

No reference-repo counterpart (SURVEY §2 extension: training-data
pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

CTX = 512  # context window, tokens
PACK_SHARDS = 8

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         doc_id % {PACK_SHARDS} AS shard,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM t
), binned AS (
  SELECT shard, CAST(floor(cum_before / {CTX}) AS BIGINT) AS win, n_tokens
  FROM c
)
SELECT shard, win,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
       {sql_round(f'LEAST(SUM(n_tokens) * 1.0 / {CTX}, 1.0)', 4)} AS fill_ratio
FROM binned GROUP BY shard, win
"""


@query("sequence_packing", oracle=_PACK_ORACLE, tags=("textops", "packing"))
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy document-concat packing into {CTX}-token context windows,
    sharded {PACK_SHARDS} ways by doc_id so every shard packs in
    parallel (the window spec is PARTITION BY shard — no global sort).
    A document belongs to the window where it starts; ``tokens_started``
    over-fills a window exactly when a document straddles the boundary,
    matching concat-and-chunk tokenizer behavior."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.select(
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / CTX)
        .cast("bigint")
        .alias("win"),
        "n_tokens",
    )
    return binned.groupBy("shard", "win").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_started"),
        round_to(
            F.least(F.sum("n_tokens") * F.lit(1.0) / CTX, F.lit(1.0)), 4
        ).alias("fill_ratio"),
    )


# per-language target keep rates (permille, integers -> exact compare)
MIX_PERMILLE = {"en": 1000, "de": 500, "fr": 500, "es": 250, "zh": 750}

_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIX_PERMILLE.items()
) + " ELSE 100 END"

_MIX_ORACLE = f"""
WITH t AS (
  SELECT lang,
         {_MIX_CASE} AS target_permille,
         CASE WHEN {sql_md5_bigint('CAST(doc_id AS VARCHAR)')} % 1000
                   < {_MIX_CASE} THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang,
       CAST(MAX(target_permille) AS BIGINT) AS target_permille,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       {sql_round('SUM(kept) * 1000.0 / COUNT(*)', 2)} AS realized_permille
FROM t GROUP BY lang
"""


@query("domain_mixing_weights", oracle=_MIX_ORACLE, tags=("textops", "sampling"))
def domain_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: per-language keep rates (permille)
    applied with the portable md5 threshold, so the selected subset is
    identical on every engine and cluster layout. Pure scan +
    aggregate — the 100 TB shape is a single pass."""
    docs = load(spark, sf_dir, "documents")
    target = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in MIX_PERMILLE.items()
        ],
        F.lit(100),
    )
    kept = F.when(
        md5_bigint(F.col("doc_id").cast("string")) % 1000 < target, 1
    ).otherwise(0)
    return (
        docs.select("lang", target.alias("target_permille"), kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.max("target_permille").cast("bigint").alias("target_permille"),
            F.count("*").alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            round_to(F.sum("kept") * F.lit(1000.0) / F.count("*"), 2).alias(
                "realized_permille"
            ),
        )
    )


N_SHARDS = 16

_SHARD_ORACLE = f"""
WITH t AS (
  SELECT {sql_md5_bigint('CAST(doc_id AS VARCHAR)')} % {N_SHARDS} AS shard,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM t GROUP BY shard
"""


@query("training_shard_assignment", oracle=_SHARD_ORACLE, tags=("textops", "packing"))
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: deal documents into
    {N_SHARDS} shards by content hash (md5 of doc_id) and report
    per-shard balance. At 100 TB this is `.repartition(N, hash)` +
    partitioned write — one shuffle, no global ORDER BY; the hash makes
    the 'shuffle' reproducible across engines and runs."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = docs.select(
        (md5_bigint(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    return t.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


N_EPOCHS = 3
HEAD_K = 10
# Checksum modulus. Each term (rn % p) * (doc_id % p) % p stays < p, so the
# term product fits int64 (p^2 < 2^63). Without the modulus the raw
# SUM(rn * doc_id) grows ~N^2 and the two engines overflow differently
# (DuckDB raises, Spark wraps) from ~15M documents. The modular form's own
# cross-engine bound is Spark's 32-bit row_number (rn wraps at 2^31 rows
# PER EPOCH, before the ~9.2e9-term sum-wrap of the non-ANSI long sum;
# DuckDB's ROW_NUMBER is BIGINT throughout) — but a >2^31-row epoch would
# never run THIS verification form at all: the per-epoch global
# row_number is the fixture-scale oracle shape, and the production form
# documented in the query docstring sorts shard-locally with no global
# rank. The modulus fixes every corpus the verification form can reach.
CHECKSUM_P = 1_000_000_007

_EPOCH_SHUFFLE_ORACLE = f"""
WITH r AS (
  SELECT e.epoch, d.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.epoch
           ORDER BY {sql_md5_bigint("CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")},
                    d.doc_id
         ) AS rn
  FROM documents d, (SELECT UNNEST(generate_series(1, {N_EPOCHS})) AS epoch) e
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       string_agg(CASE WHEN rn <= {HEAD_K} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY rn) AS head_docs,
       CAST(SUM((rn % {CHECKSUM_P}) * (doc_id % {CHECKSUM_P}) % {CHECKSUM_P})
            % {CHECKSUM_P} AS BIGINT) AS perm_checksum
FROM r GROUP BY epoch
"""


@query("epoch_shuffle_order", oracle=_EPOCH_SHUFFLE_ORACLE, tags=("textops", "packing", "U4"))
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic training shuffle: each epoch e re-orders
    the corpus by md5(e || ':' || doc_id) — a different but fully
    reproducible permutation per epoch, the property a resumable
    trainer needs (restart epoch 2 anywhere, get the same order; no
    RNG state to persist). One row per epoch: the first {HEAD_K}
    doc_ids in order (the readable head) and sum(rank x doc_id) mod
    {CHECKSUM_P} over the ENTIRE permutation — a checksum the oracle
    can only match if every rank of every document agrees, not just
    the head (modular so the two engines' overflow behavior can never
    diverge within this form's reach; the binding limits are at
    CHECKSUM_P above).

    Scale note: the per-epoch global row_number is the VERIFICATION
    form (one range exchange per epoch at fixture scale). The 100 TB
    production form keeps the same salted hash but never totally
    orders: shard = pmod(hash, n_shards) routes the write
    (training_shard_assignment above) and each shard sorts locally —
    identical read order per epoch, no global sort."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    e = docs.withColumn("epoch", F.explode(F.sequence(F.lit(1), F.lit(N_EPOCHS))))
    h = md5_bigint(
        F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("epoch").orderBy(h.asc(), F.col("doc_id").asc())
    r = e.withColumn("rn", F.row_number().over(w))
    return r.groupBy(F.col("epoch").cast("bigint").alias("epoch")).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= HEAD_K,
                            F.struct(F.col("rn"), F.col("doc_id")),
                        )
                    )
                ),
                lambda s: s["doc_id"].cast("string"),
            ),
        ).alias("head_docs"),
        (
            F.sum(
                (F.col("rn") % CHECKSUM_P) * (F.col("doc_id") % CHECKSUM_P) % CHECKSUM_P
            )
            % CHECKSUM_P
        )
        .cast("bigint")
        .alias("perm_checksum"),
    )
