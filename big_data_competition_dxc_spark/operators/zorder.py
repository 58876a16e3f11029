"""Z-order (Morton) data-layout audit — multi-dimensional clustering
for scan pruning, the storage-layout half of the 100 TB story.

Partition pruning (sources/roundtrip.py) and bucketing (bucketing.py)
prune on ONE key each. When scans filter on TWO independent columns
(part AND ship date), a single-column sort makes file-level min/max
statistics useless for the other column: every file spans the full
range. Interleaving the bits of both columns' rank-buckets (the Morton
/ Z-curve) and laying files out along that curve bounds EVERY file in
BOTH dimensions at once — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, built here from stock expressions:

1. per-dimension equal-frequency buckets 0..{GRID-1} via NTILE over a
   deterministic total order (value, then unique row key tie-break —
   cross-engine-stable where raw ranks would tie);
2. Morton code z = Σ_i (bit i of bx) << 2i | (bit i of by) << (2i+1)
   — pure div/mod integer arithmetic, no UDF;
3. files = NTILE({FILES}) along z order (what a writer would
   repartitionByRange on);
4. the audit: per-file bounding box in BUCKET units for both
   dimensions, and the summary a query planner cares about — the mean
   per-file extent of each dimension. Under a shipdate-only sort the
   date extent is minimal but the part extent is ~{GRID} (no pruning);
   under z-order BOTH mean extents land near sqrt-law mid-range, so a
   predicate on EITHER dimension skips most files.

The whole audit is relational (windows + integer arithmetic) and
oracle-paired; tests/test_behavior_invariants.py additionally pins the
pruning law itself (z-order part-extent ≪ date-sorted part-extent).

Scale notes: the fixture-scale audit uses global NTILE windows (the
same single-ordering cost class as the O1 global ORDER BY queries); at
100 TB the per-dimension bucket ids come from approx-percentile
boundaries broadcast to a narrow map (no global window), and the file
assignment IS ``repartitionByRange(z) + sortWithinPartitions(z)`` —
the z column itself is the same pure integer expression either way.
The audit's per-file stats are exactly the parquet footer min/max the
scan planner would prune with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

GRID_BITS = 5
GRID = 1 << GRID_BITS  # 32 buckets per dimension
FILES = 64


def _morton_sql(bx: str, by: str) -> str:
    """Bit-interleave two {GRID_BITS}-bit bucket ids with div/mod only."""
    terms = []
    for i in range(GRID_BITS):
        terms.append(f"(({bx} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({by} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _morton_col(bx: str, by: str):
    """Spark twin of :func:`_morton_sql` — exact integer div/mod."""
    terms = []
    for i in range(GRID_BITS):
        terms.append(f"(({bx} div {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({by} div {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return F.expr(" + ".join(terms))


_ZORDER_ORACLE = f"""
WITH b AS (
  SELECT NTILE({GRID}) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) - 1
           AS bx,
         NTILE({GRID}) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1
           AS by,
         ROW_NUMBER() OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) AS rid
  FROM lineitem
),
z AS (
  SELECT bx, by, {_morton_sql('bx', 'by')} AS zv, rid
  FROM b
),
f AS (
  SELECT bx, by,
         NTILE({FILES}) OVER (ORDER BY zv, rid) AS file_id
  FROM z
),
per_file AS (
  SELECT file_id,
         MAX(bx) - MIN(bx) + 1 AS part_extent,
         MAX(by) - MIN(by) + 1 AS date_extent,
         COUNT(*) AS n_rows
  FROM f GROUP BY file_id
)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(part_extent AS BIGINT) AS part_extent,
       CAST(date_extent AS BIGINT) AS date_extent,
       CAST(n_rows AS BIGINT) AS n_rows
FROM per_file
"""


@query(
    "zorder_layout_audit",
    oracle=_ZORDER_ORACLE,
    tags=("layout", "W4", "O1", "scale"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per z-ordered file: bounding box (bucket-unit extents) in BOTH
    clustered dimensions plus row count — the min/max footer statistics
    a scan planner prunes with. Every extent should sit far below
    {GRID} in both dimensions simultaneously (the property no
    single-column sort can deliver)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber"
    )
    wx = Window.orderBy("l_partkey", "l_orderkey", "l_linenumber")
    wy = Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    b = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        (F.ntile(GRID).over(wx) - 1).alias("bx"),
        (F.ntile(GRID).over(wy) - 1).alias("by"),
    )
    z = b.select(
        "bx",
        "by",
        _morton_col("bx", "by").alias("zv"),
        F.row_number().over(wx).alias("rid"),
    )
    f = z.select(
        "bx", "by", F.ntile(FILES).over(Window.orderBy("zv", "rid")).alias("file_id")
    )
    return f.groupBy("file_id").agg(
        (F.max("bx") - F.min("bx") + 1).cast("bigint").alias("part_extent"),
        (F.max("by") - F.min("by") + 1).cast("bigint").alias("date_extent"),
        F.count("*").alias("n_rows"),
    ).select(
        F.col("file_id").cast("bigint").alias("file_id"),
        "part_extent",
        "date_extent",
        "n_rows",
    )
