"""Sequential-pattern mining (PrefixSpan) over user-day event journeys.

Completes the ``pyspark.ml.fpm`` surface next to FP-growth (ml/fpm.py):
FP-growth mines unordered baskets; PrefixSpan mines ORDERED journeys —
"view then click then purchase" — the behavioral-analytics primitive
behind funnel discovery (operators/funnel.py hand-specifies one funnel;
PrefixSpan finds all frequent ones).

Oracle strategy, same trick as fpgrowth_pair_itemsets: projected to
LENGTH-2 patterns of singleton itemsets, PrefixSpan's support count is
exactly "number of sequences containing event a strictly-before event
b" — a DISTINCT self-join + HAVING in SQL. Sequences are USER-DAYS
(not whole users: with ~67 events per user every pair saturates at
100% support and no threshold can bind; per-day journeys of ~2.5
events give a 7.5–9.1% support spread at sf0.01, so MIN_SUPPORT=0.085
actively prunes — the oracle verifies the threshold, not a no-op).
Sequence order ties break on event_id, mirrored in the oracle's
``(b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))``.

Both engines derive minCount with the same IEEE double expression
(ceil(MIN_SUPPORT * n_sequences), Spark mllib's exact formula), so the
cutoff cannot drift cross-engine.

Scale notes (100 TB): PrefixSpan distributes by prefix projection —
each frequent prefix's projected database is processed independently;
maxPatternLength=2 bounds the projection depth, and the
sequence-assembly groupBy shuffles once on (user_id, ds). The oracle's
self-join is the quadratic baseline the library exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

MIN_SUPPORT = 0.085
MAX_PATTERN_LENGTH = 2

_SEQ_COUNT_SQL = """
  SELECT COUNT(*) FROM (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS ds FROM events
  )
"""


@query(
    "prefixspan_day_journeys",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT a.user_id, CAST(a.ts AS DATE) AS ds,
         a.event_type AS first_type, b.event_type AS then_type
  FROM events a
  JOIN events b
    ON a.user_id = b.user_id
   AND CAST(a.ts AS DATE) = CAST(b.ts AS DATE)
   AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
)
SELECT first_type, then_type, COUNT(*) AS n_days
FROM pairs
GROUP BY first_type, then_type
HAVING COUNT(*) >= CEIL(CAST({MIN_SUPPORT} AS DOUBLE) * ({_SEQ_COUNT_SQL}))
""",
    tags=("ML", "affinity", "W1"),
)
def prefixspan_day_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All frequent length-2 ordered journeys (a then b, possibly with
    events between) across user-day sequences, support >= {MIN_SUPPORT}
    of all sequences. Must equal the SQL strictly-before self-join."""
    from pyspark.ml.fpm import PrefixSpan

    ev = load(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("ds"),
            "ts",
            "event_id",
            "event_type",
        )
        .groupBy("user_id", "ds")
        .agg(
            # array_sort on structs orders by (ts, event_id) — the
            # deterministic tie-break the oracle mirrors
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
    patterns = PrefixSpan(
        minSupport=MIN_SUPPORT,
        maxPatternLength=MAX_PATTERN_LENGTH,
        sequenceCol="sequence",
    ).findFrequentSequentialPatterns(seqs)
    return (
        patterns.filter(
            (F.size("sequence") == 2)
            & (F.size(F.col("sequence")[0]) == 1)
            & (F.size(F.col("sequence")[1]) == 1)
        )
        .select(
            F.col("sequence")[0][0].alias("first_type"),
            F.col("sequence")[1][0].alias("then_type"),
            F.col("freq").alias("n_days"),
        )
    )
