"""Subword-vocabulary statistics: the BPE first-merge pair table.

Byte-pair-encoding tokenizer training starts from exactly this
aggregate: the frequency of every ADJACENT SYMBOL PAIR inside words
across the corpus (the most frequent pair becomes the first merge
rule; iterate). The full BPE loop is sequential-by-construction (each
merge changes the next count table), but every iteration's count step
is this one distributed aggregate — at 100 TB the count table is the
expensive part and the merge choice is a driver-side argmax over a
frame the size of the symbol-pair alphabet. This operator publishes
iteration zero: character-bigram frequencies within words, with
deterministic top-K (count DESC, pair ASC).

Implementation is pure JVM higher-order array ops — split to words,
explode, enumerate the length(w)-1 adjacent character pairs with
transform(sequence(...)) / substring — no Python anywhere; DuckDB
recomputes the identical pairs with list_transform(generate_series(..))
+ substr. Both engines slice multi-space runs to empty words, which
contribute no pairs (length-1 and empty words have no adjacent pair).

Scale notes: explode is linear in corpus characters; one map-side-
combinable groupBy on the pair; the top-K is a TakeOrderedAndProject
(no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

TOP_PAIRS = 30


@query(
    "bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair
  FROM words
  WHERE len(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {TOP_PAIRS}
""",
    tags=("textops", "vocab", "A1", "O3"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_PAIRS} adjacent character pairs inside words across the
    corpus — the count table of BPE merge iteration zero (count DESC,
    pair tie-break)."""
    docs = load(spark, sf_dir, "documents").select("text")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(TOP_PAIRS)
    )
