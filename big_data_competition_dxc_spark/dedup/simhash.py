"""SimHash near-dup fingerprints: one 48-bit signature per document,
near-dup = small Hamming distance.

Complementary to MinHash: a SimHash fingerprint is a single BIGINT per
doc (cheap to store/index at 100 TB); candidate pairs come from
fingerprint-prefix bucketing or, here at test scale, a direct pairwise
Hamming scan. Token hashing is the same portable md5->bigint trick as
minhash.py so the full computation has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.memos import (
    evict_other_sessions,
    memo_key,
    note_warm_hit,
    register_memo,
)
from ..plans.registry import query
from ..sources import load

NUM_BITS = 48
HAMMING_THRESHOLD = 6


_FINGERPRINT_SQL = f"""
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS cnt,
         ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h
  FROM toks GROUP BY doc_id, tok
),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS contrib
  FROM tok_counts, (SELECT unnest(range(0, {NUM_BITS})) AS j)
  GROUP BY doc_id, j
),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN contrib > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)"""


@query(
    "simhash_fingerprints",
    oracle=f"WITH {_FINGERPRINT_SQL} SELECT doc_id, CAST(simhash AS BIGINT) AS simhash FROM fp",
    tags=("dedup", "simhash"),
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document: md5-hash each distinct token (12 hex
    chars -> 48 bits), weight each bit +count/-count, sign -> bit."""
    fp = _fingerprints(spark, sf_dir)
    return fp.select("doc_id", F.col("simhash").cast("bigint").alias("simhash"))


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    tok_counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    from ..functions.hashing import md5_bigint

    tok_counts = tok_counts.withColumn("h", md5_bigint(F.col("tok"), 12))
    bits = (
        tok_counts.select(
            "doc_id",
            "cnt",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(NUM_BITS - 1))).alias("j"),
        )
        .withColumn(
            "contrib",
            F.when(F.expr("(h >> j) & 1 = 1"), F.col("cnt")).otherwise(-F.col("cnt")),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("contrib"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("contrib") > 0, F.expr("CAST(1 AS BIGINT) << j")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


_PAIRS_ORACLE = f"""
WITH {_FINGERPRINT_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) <= {HAMMING_THRESHOLD}
"""


NUM_CHUNKS = HAMMING_THRESHOLD + 1  # pigeonhole: >=1 chunk matches exactly


def _chunk_bounds() -> list[tuple[int, int]]:
    """(offset, width) per chunk, splitting NUM_BITS as evenly as possible."""
    base, extra = divmod(NUM_BITS, NUM_CHUNKS)
    bounds, off = [], 0
    for c in range(NUM_CHUNKS):
        width = base + (1 if c < extra else 0)
        bounds.append((off, width))
        off += width
    return bounds


# The pair set is the shared canonical intermediate of THREE registered
# queries (the listing + both bounded twins) — production computes it
# once per corpus, so it is memoized like ml/recommend's cosine pairs:
# keyed (applicationId, sf_dir), cached, registered for the central
# session hygiene (plans/memos.py; bench clears between blocks), and
# bypassed in plan-audit mode so .explain shows the real pipeline.
_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


@query("simhash_neardup_pairs", oracle=_PAIRS_ORACLE, bench=True, tags=("dedup", "simhash"))
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs within Hamming distance {HAMMING_THRESHOLD} of each
    other's SimHash, found WITHOUT an all-pairs scan: pigeonhole — any
    two fingerprints differing in <= {HAMMING_THRESHOLD} bits must agree
    exactly on at least one of {NUM_CHUNKS} bit-chunks, so candidates
    come from an equi-join on (chunk_idx, chunk_value) buckets and only
    survivors pay the bit_count. Same result set as the oracle's
    all-pairs form, linear-ish cost (the plan audit forbids the
    nested-loop join the naive form would produce)."""
    import os

    audit_mode = bool(os.environ.get("SPARK_GRAFT_NO_CHECKPOINT"))
    key = memo_key(spark, sf_dir)
    if not audit_mode:
        hit = _PAIRS_MEMO.get(key)
        if hit is not None:
            note_warm_hit()
            return hit
        evict_other_sessions(key)
    fp = _fingerprints(spark, sf_dir).select(
        "doc_id", F.col("simhash").cast("bigint").alias("simhash")
    )
    chunk_cols = [
        F.expr(f"(simhash >> {off}) & {(1 << width) - 1}").alias(f"c{i}")
        for i, (off, width) in enumerate(_chunk_bounds())
    ]
    keyed = fp.select("doc_id", "simhash", *chunk_cols)
    stack_args = ", ".join(f"{i}, c{i}" for i in range(NUM_CHUNKS))
    buckets = keyed.selectExpr(
        "doc_id", "simhash", f"stack({NUM_CHUNKS}, {stack_args}) as (chunk, key)"
    )
    # shuffle_hash on the build side: the bucket self-join's SMJ sorts
    # were the query's hot spot (r9 A/B at sf1: 9.4s -> 4.0s for the
    # candidate stage, same exchange, byte-identical rows — the same
    # physical-strategy lesson as the jaccard shingle join).
    a, b = buckets.alias("a"), buckets.hint("shuffle_hash").alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sim_a"),
        F.col("b.simhash").alias("sim_b"),
    )
    # a pair can share several chunks -> dedup before scoring
    cand = cand.distinct()
    ham = F.expr("bit_count(sim_a ^ sim_b)").cast("int")
    out = cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= HAMMING_THRESHOLD
    )
    if audit_mode:
        return out
    out = out.cache()
    _PAIRS_MEMO[key] = out
    return out


# ---------------------------------------------------------------------------
# Bounded-output twins. The pair LISTING above is the fixture/debug
# form: its OUTPUT grows superlinearly with corpus size (observed 19.5x
# rows at 10x input in BENCH_r07) even though the pigeonhole join keeps
# the COMPUTE near-linear — at 100 TB the result set itself becomes the
# scale-killer. The production shapes are (a) per-doc top-k matches
# (what canonical-assignment dedup actually consumes; output is O(k)
# per matched doc, linear in corpus) and (b) a constant-size Hamming
# histogram (what threshold calibration consumes; output ratio ~1 at
# any scale).
# ---------------------------------------------------------------------------

TOP_K_MATCHES = 3

_TOPK_ORACLE = f"""
WITH pairs AS ({_PAIRS_ORACLE}),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS other_doc_id, hamming FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS other_doc_id, hamming FROM pairs
),
ranked AS (
  SELECT doc_id, other_doc_id, hamming,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY hamming, other_doc_id
         ) AS match_rank,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
  FROM sym
)
SELECT doc_id, CAST(match_rank AS INT) AS match_rank, other_doc_id, hamming,
       CAST(n_matches AS BIGINT) AS n_matches
FROM ranked WHERE match_rank <= {TOP_K_MATCHES}
"""


@query(
    "simhash_neardup_topk_per_doc",
    oracle=_TOPK_ORACLE,
    bench=True,
    tags=("dedup", "simhash", "bounded"),
)
def simhash_neardup_topk_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-{TOP_K_MATCHES} nearest SimHash matches (plus the
    doc's total match count): the bounded production form of
    simhash_neardup_pairs. Same pigeonhole candidate join; the pair set
    is then symmetrized and cut per doc with a row_number window
    (deterministic order: hamming asc, other id asc), so output is
    O(k) per matched doc — linear in corpus — instead of O(pairs)."""
    from pyspark.sql.window import Window

    pairs = simhash_neardup_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("other_doc_id"),
        "hamming",
    ).unionAll(
        pairs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("other_doc_id"),
            "hamming",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("hamming").asc(), F.col("other_doc_id").asc()
    )
    wc = Window.partitionBy("doc_id")
    return (
        sym.withColumn("match_rank", F.row_number().over(w))
        .withColumn("n_matches", F.count("*").over(wc).cast("bigint"))
        .filter(F.col("match_rank") <= TOP_K_MATCHES)
        .select("doc_id", "match_rank", "other_doc_id", "hamming", "n_matches")
    )


_SUMMARY_ORACLE = f"""
WITH pairs AS ({_PAIRS_ORACLE}),
sym AS (
  SELECT doc_a AS doc_id, hamming FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id, hamming FROM pairs
)
SELECT hamming,
       CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM sym GROUP BY hamming
"""


@query(
    "simhash_neardup_summary",
    oracle=_SUMMARY_ORACLE,
    bench=True,
    tags=("dedup", "simhash", "bounded"),
)
def simhash_neardup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram of the near-dup pair set (pairs and
    distinct docs per distance): the constant-size calibration form —
    at most HAMMING_THRESHOLD+1 output rows at ANY corpus size, so the
    BENCH output_ratio stays ~1 while the listing form's grows with
    the pair count. One extra shuffle (groupBy hamming) over the same
    pigeonhole candidate join."""
    pairs = simhash_neardup_pairs(spark, sf_dir)
    sym = pairs.select(F.col("doc_a").alias("doc_id"), "hamming").unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"), "hamming")
    )
    return sym.groupBy("hamming").agg(
        (F.count("*") / 2).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
