"""Benchmark-contamination detection via n-gram overlap.

The standard eval-hygiene step of a pre-training pipeline (GPT-3
appendix C, PaLM §8): a training document is contaminated if it shares
enough long token n-grams with a held-out benchmark document. Here the
"benchmark" is a deterministic slice of the corpus (doc_id % 97 == 0),
the n-grams are token 5-grams, and a training doc is flagged when it
shares >= MIN_HITS distinct 5-grams with any benchmark doc (any-overlap
at MIN_HITS=1, the GPT-3 appendix-C rule).

Scale notes (100 TB): shingles are hashed to 60-bit ints before the
join, so the shuffle carries fixed-width keys, not strings. The join
is a hash equi-join on the n-gram hash — the benchmark side is tiny
(eval suites are MBs) and is broadcast; the training side streams
through map-side. Distinct-before-join keeps within-doc repeats from
inflating the pair fanout. No all-pairs comparison anywhere.

No reference-repo counterpart (SURVEY §2 extension: training-data
pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..plans.registry import query
from ..sources import load

NGRAM = 5
BENCH_MOD = 97  # doc_id % 97 == 0 -> benchmark slice
MIN_HITS = 1  # any shared distinct 5-gram flags the doc (GPT-3-style
# any-overlap rule; raise for noisier real corpora)

_SHINGLES_SQL = f"""
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(l) - {NGRAM - 2}),
                          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                               || ' ' || l[i+3] || ' ' || l[i+4])
         )) AS ng
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents)
"""

_CONTAM_ORACLE = f"""
WITH sh AS ({_SHINGLES_SQL}),
hashed AS (
  SELECT doc_id, {sql_md5_bigint('ng')} AS h FROM sh
),
train AS (SELECT * FROM hashed WHERE doc_id % {BENCH_MOD} <> 0),
bench AS (SELECT * FROM hashed WHERE doc_id % {BENCH_MOD} = 0)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS shared_ngrams,
       CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS bench_docs_hit
FROM train t JOIN bench b ON t.h = b.h
GROUP BY t.doc_id
HAVING COUNT(*) >= {MIN_HITS}
"""


@query(
    "benchmark_contamination",
    oracle=_CONTAM_ORACLE,
    tags=("textops", "dedup", "contamination"),
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >= {MIN_HITS} distinct token 5-grams with
    the benchmark slice (doc_id % {BENCH_MOD} == 0): per contaminated
    doc, how many 5-grams leak and how many benchmark docs they hit.
    Broadcast hash join on 60-bit shingle hashes."""
    docs = load(spark, sf_dir, "documents")
    l = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(l) - (NGRAM - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(l, i + k) for k in range(NGRAM)]
            ),
        )
    )
    hashed = (
        docs.filter(F.size(l) >= NGRAM)  # sequence(1, n-4) needs n >= 5
        .select("doc_id", F.explode(grams).alias("ng"))
        .select("doc_id", md5_bigint(F.col("ng")).alias("h"))
    )
    train = hashed.filter(F.col("doc_id") % BENCH_MOD != 0)
    bench = hashed.filter(F.col("doc_id") % BENCH_MOD == 0).withColumnRenamed(
        "doc_id", "bench_doc_id"
    )
    return (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("shared_ngrams"),
            F.countDistinct("bench_doc_id").alias("bench_docs_hit"),
        )
        .filter(F.col("shared_ngrams") >= MIN_HITS)
    )
