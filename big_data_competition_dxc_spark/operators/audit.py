"""Data-quality audits a warehouse runs before trusting a new load:
referential integrity across every FK edge, and join-key skew
profiling.

The reference trusts its joins blindly (流行音乐趋势预测.md joins carry no
orphan checks); at 100 TB a silent orphan rate is how a LEFT JOIN
quietly nulls a feature column. Both audits are pure aggregates —
anti-join counts and a per-key histogram — so they cost one pass each
and emit dashboard-sized results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

# (edge name, child table, child key, parent table, parent key)
_FK_EDGES = (
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

_INTEGRITY_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(COUNT(DISTINCT {ck}) AS BIGINT) AS n_child_keys,
       CAST(SUM(CASE WHEN {ck} IS NULL THEN 1
                     WHEN {ck} NOT IN (SELECT {pk} FROM {parent}) THEN 1
                     ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child}"""
    for edge, child, ck, parent, pk in _FK_EDGES
)


@query("referential_integrity_audit", oracle=_INTEGRITY_ORACLE, tags=("J8", "A8", "audit"))
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge of the star schema: child rows, distinct
    child keys, and orphans (child keys with no parent — NULLs count as
    orphans). Each edge is ONE pass over the child: a left outer join
    against the broadcast parent key set feeds a single aggregate
    computing rows, distinct keys, and the null-parent (= orphan)
    count together — r13 ran a separate anti-join scan plus a stats
    scan per edge (14 child scans for 7 edges; lineitem alone was read
    6x), and the fold halves that to 7 (guide §1.2: don't read what
    you already read). A NULL child key never equi-matches, so it
    surfaces as an orphan exactly as the anti-join counted it, and
    COUNT(DISTINCT ck) ignores NULLs in both engines. The union of
    seven 1-row aggregates is driver-trivial. The load gate a 100 TB
    ingest runs before any downstream join is allowed to assume its
    dims."""
    out = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(pk).distinct()
        row = (
            c.join(F.broadcast(p), c[ck] == p[pk], "left")
            .agg(
                F.count("*").alias("n_child_rows"),
                F.countDistinct(ck).alias("n_child_keys"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(edge).alias("fk_edge"),
                "n_child_rows",
                "n_child_keys",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


SKEW_KEY = "user_id"

_SKEW_ORACLE = f"""
WITH per_key AS (
  SELECT {SKEW_KEY} AS k, COUNT(*) AS n FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MIN(n) AS BIGINT) AS min_rows,
       CAST(MAX(n) AS BIGINT) AS max_rows,
       {sql_round('quantile_cont(n, 0.99)', 4)} AS p99_rows,
       {sql_round('CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n)', 4)} AS skew_factor,
       CAST(MIN(CASE WHEN n = (SELECT MAX(n) FROM per_key) THEN k END) AS BIGINT)
         AS hottest_key
FROM per_key
"""


@query("join_key_skew_profile", oracle=_SKEW_ORACLE, tags=("A9", "audit", "skew"))
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis for a prospective shuffle key: per-key
    row counts reduced to the numbers that decide a join strategy —
    max/p99 group size, the skew factor (hottest key vs perfectly
    uniform), and WHICH key is hottest (min key id among ties, so the
    answer is deterministic). This is the measurement behind the
    salting/AQE-skew-join decisions documented in
    operators/bucketing.py; at 100 TB it is one partial-agg pass plus
    a scalar reduce."""
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy(F.col(SKEW_KEY).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    # single-pass deterministic argmax: max over (n, -k) structs picks
    # the highest count and, among ties, the LOWEST key id
    best = F.max(F.struct(F.col("n").alias("n"), (-F.col("k")).alias("neg_k")))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        round_to(F.percentile("n", F.lit(0.99)), 4).alias("p99_rows"),
        round_to(F.max("n").cast("double") * F.count("*") / F.sum("n"), 4).alias(
            "skew_factor"
        ),
        (-best.getField("neg_k")).cast("bigint").alias("hottest_key"),
    )


MAD_K = 3.0

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       {sql_round('d.med', 4)} AS median_value,
       {sql_round('a.mad', 4)} AS mad_value,
       CAST(SUM(CASE WHEN d.adev > {MAD_K} * a.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type, d.med, a.mad
"""


@query("robust_outlier_mad", oracle=_MAD_ORACLE, tags=("A9", "audit", "robust"))
def robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier audit per event type — the
    quality-scoring complement to the z-score outlier filter
    (operators/filters.py), immune to the outliers it is hunting:
    median and median-absolute-deviation come from two grouped
    percentile aggregates (each a distributed partial-agg, 5-row
    results broadcast back), and a row is an outlier beyond
    {MAD_K} x MAD. Both engines evaluate the identical interpolation
    and compare, so the boundary is engine-exact. Two fact scans total
    — the price of exact medians; the documented approximate path is
    percentile_approx with one scan."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "event_type",
            round_to(F.col("med"), 4).alias("median_value"),
            round_to(F.col("mad"), 4).alias("mad_value"),
            "n_outliers",
            "n_rows",
        )
    )


_CHECKSUM_ORACLE = """
WITH o AS (
  SELECT COUNT(*) AS n_rows,
         bit_xor(('0x' || substr(md5(
             COALESCE(CAST(o_orderkey AS VARCHAR), '∅') || '|' ||
             COALESCE(CAST(o_custkey AS VARCHAR), '∅') || '|' ||
             COALESCE(o_orderstatus, '∅') || '|' ||
             COALESCE(o_orderpriority, '∅') || '|' ||
             COALESCE(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), '∅') || '|' ||
             COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '∅')
         ), 1, 15))::BIGINT) AS checksum
  FROM orders
), l AS (
  SELECT COUNT(*) AS n_rows,
         bit_xor(('0x' || substr(md5(
             COALESCE(CAST(l_orderkey AS VARCHAR), '∅') || '|' ||
             COALESCE(CAST(l_linenumber AS VARCHAR), '∅') || '|' ||
             COALESCE(l_returnflag, '∅') || '|' ||
             COALESCE(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), '∅') || '|' ||
             COALESCE(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), '∅')
         ), 1, 15))::BIGINT) AS checksum
  FROM lineitem
)
SELECT 'orders' AS tbl, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(checksum AS BIGINT) AS checksum FROM o
UNION ALL
SELECT 'lineitem' AS tbl, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(checksum AS BIGINT) AS checksum FROM l
"""


NULL_SENTINEL = "∅"


def _row_checksum(cols) -> "F.Column":
    """XOR-of-md5 row fingerprint over a canonical '|'-joined rendering.

    Every field is coalesced to an explicit sentinel BEFORE joining:
    Spark's concat_ws silently SKIPS null arguments while a SQL '||'
    chain nullifies the whole rendering, so without the sentinel the
    two engines fingerprint different things for any null field. The
    '|' separator is also ambiguous if a string field can itself
    contain '|' ('a|b', 'c' vs 'a', 'b|c' render identically); callers
    must render fields that can contain the separator through an
    escaping cast first."""
    from ..functions.hashing import md5_bigint

    rendered = [F.coalesce(c, F.lit(NULL_SENTINEL)) for c in cols]
    return F.bit_xor(md5_bigint(F.concat_ws("|", *rendered)))


@query("table_checksum_audit", oracle=_CHECKSUM_ORACLE, tags=("audit", "A9"))
def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints: per table, the row count
    and the bit_xor of a portable md5 over a canonical row rendering —
    the anti-entropy check that detects drift between two copies of a
    dataset (replication, backfill, engine migration) without moving
    either. XOR is commutative/associative, so the checksum is
    identical on any partitioning, any engine, any row order; doubles
    enter as exact integer cents and timestamps as ISO dates, the
    cross-engine-stable renderings. 100 TB: one narrow scan per table,
    partial XOR map-side, a single 64-bit value shuffled."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100.0 + F.lit(0.5)).cast("bigint").cast("string")  # noqa: E731
    o = orders.agg(
        F.count("*").alias("n_rows"),
        _row_checksum(
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
                cents("o_totalprice"),
                F.col("o_orderdate").cast("date").cast("string"),
            ]
        ).alias("checksum"),
    ).select(F.lit("orders").alias("tbl"), "n_rows", "checksum")
    l = li.agg(
        F.count("*").alias("n_rows"),
        _row_checksum(
            [
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_returnflag"),
                cents("l_extendedprice"),
                F.col("l_shipdate").cast("date").cast("string"),
            ]
        ).alias("checksum"),
    ).select(F.lit("lineitem").alias("tbl"), "n_rows", "checksum")
    return o.unionAll(l)


# ---------------------------------------------------------------------------
# ANALYZE-style one-pass column profile (r6)
# ---------------------------------------------------------------------------

# (profile column, post-aggregate render template) — MIN/MAX aggregate
# over the NATIVE type (numeric/date/string order), and only the single
# resulting value passes through the exact cross-engine rendering
# (integer cents for doubles, ISO date for the timestamp — same
# discipline as table_checksum_audit). Rendering before aggregating
# would silently turn numeric min/max into lexicographic min/max
# ("999" > "1000"). {v} is MIN(col)/MAX(col); {s} is the engine's
# string type keyword (Spark: STRING, DuckDB: VARCHAR).
_PROFILE_COLS = (
    ("o_orderkey", "CAST({v} AS {s})"),
    ("o_custkey", "CAST({v} AS {s})"),
    ("o_orderstatus", "{v}"),
    ("o_orderpriority", "{v}"),
    ("o_totalprice", "CAST(CAST(floor({v} * 100.0 + 0.5) AS BIGINT) AS {s})"),
    ("o_orderdate", "CAST(CAST({v} AS DATE) AS {s})"),
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{col}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       {render.format(v=f'MIN({col})', s='VARCHAR')} AS min_render,
       {render.format(v=f'MAX({col})', s='VARCHAR')} AS max_render
FROM orders"""
    for col, render in _PROFILE_COLS
)


@query("table_profile", oracle=_PROFILE_ORACLE, tags=("A8", "A9", "audit"))
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of `orders`, long format: per column
    the row count, null count, exact distinct count, and min/max under
    an exact cross-engine rendering (cents for doubles, ISO date for
    the timestamp) — the statistics a cost-based optimizer ingests and
    the first data-quality snapshot a new load gets. One logical pass:
    Spark plans the multi-column DISTINCT aggregate via EXPAND (input
    replicated once per distinct column, then one partial-aggregated
    shuffle). At 100 TB swap the exact NDVs for approx_count_distinct
    (HLL++, one pass, no expand) — `approx_distinct_check` measures
    precisely the error that swap accepts. MIN/MAX aggregate over the
    NATIVE type; only the resulting scalar passes through the exact
    rendering (cents / ISO date), because rendering first would turn
    numeric order into lexicographic order and raw double/timestamp
    formatting differs across engines.

    ONE aggregate computes every column's stats (the r6 original
    union-ed six single-column branches — six scans, twelve
    exchanges); the profile now reads the table once, Catalyst plans
    the six DISTINCTs as a single 6-way Expand, and stack() unpivots
    the one wide row. tests/test_plans.py pins the 2-exchange
    budget."""
    orders = load(spark, sf_dir, "orders")
    aggs = []
    for col, render in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(col)).alias(f"nn_{col}"),
            F.count_distinct(F.col(col)).alias(f"nd_{col}"),
            F.expr(render.format(v=f"MIN({col})", s="STRING")).alias(f"mn_{col}"),
            F.expr(render.format(v=f"MAX({col})", s="STRING")).alias(f"mx_{col}"),
        ]
    wide = orders.agg(F.count("*").alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{col}', n_rows, nn_{col}, nd_{col}, mn_{col}, mx_{col}"
        for col, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_render, max_render)"
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation: full-outer diff of two table versions (r6)
# ---------------------------------------------------------------------------

_DIFF_FP_SQL = (
    "CAST(user_id AS VARCHAR) || '|' || event_type || '|' || "
    "CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR) || '|' || "
    "CAST(epoch_us(ts) AS VARCHAR)"
)


def _diff_oracle() -> str:
    from ..functions.hashing import sql_md5_bigint

    salted = "'{salt}' || CAST(event_id AS VARCHAR)"
    in_a = f"{sql_md5_bigint(salted.format(salt='snapA:'))} % 20 <> 0"
    in_b = f"{sql_md5_bigint(salted.format(salt='snapB:'))} % 25 <> 0"
    changed = f"{sql_md5_bigint(salted.format(salt='chg:'))} % 10 = 0"
    return f"""
WITH a AS (
  SELECT event_id, {_DIFF_FP_SQL} AS fp
  FROM events WHERE {in_a}
),
b AS (
  SELECT event_id,
         CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
         CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
              + CASE WHEN {changed} THEN 100 ELSE 0 END AS VARCHAR) || '|' ||
         CAST(epoch_us(ts) AS VARCHAR) AS fp
  FROM events WHERE {in_b}
)
SELECT CAST(SUM(CASE WHEN b.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
       CAST(SUM(CASE WHEN a.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
       CAST(SUM(CASE WHEN a.event_id IS NOT NULL AND b.event_id IS NOT NULL
                      AND a.fp <> b.fp THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN a.fp = b.fp THEN 1 ELSE 0 END) AS BIGINT) AS n_identical
FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
"""


@query("table_diff_audit", oracle=_diff_oracle(), tags=("audit", "J8", "U3"))
def table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation of two snapshots of the same table —
    the migration/replication validator that says WHERE two copies
    disagree, where `table_checksum_audit` only says THAT they do.
    Snapshot A drops a deterministic ~5% of events (rows B gained),
    snapshot B drops a disjoint ~4% (rows B lost) and perturbs ~10% of
    values by +1.00 (rows changed); both derivations are md5-salted so
    the slices are engine-portable. One full-outer join on the key
    compares exact-render row fingerprints (cents + epoch-micros — the
    same cross-engine-stable renderings as the checksum audit) and
    classifies every key: only-in-A, only-in-B, changed, identical.
    100 TB: one hash exchange per side on the join key, fingerprints
    computed map-side, AND the whole comparison is partitionable by
    key range for resumable reconciliation. Output is one dashboard
    row."""
    from ..functions.hashing import md5_bigint

    ev = load(spark, sf_dir, "events")
    sid = F.col("event_id").cast("string")
    fp_base = [
        F.col("user_id").cast("string"),
        F.col("event_type"),
    ]
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    micros = F.unix_micros(F.col("ts")).cast("string")
    a = ev.filter(md5_bigint(F.concat(F.lit("snapA:"), sid)) % 20 != 0).select(
        "event_id",
        F.concat_ws(
            "|", *fp_base, cents.cast("string"), micros
        ).alias("fp"),
    )
    bumped = cents + F.when(
        md5_bigint(F.concat(F.lit("chg:"), sid)) % 10 == 0, F.lit(100)
    ).otherwise(F.lit(0))
    b = ev.filter(md5_bigint(F.concat(F.lit("snapB:"), sid)) % 25 != 0).select(
        "event_id",
        F.concat_ws(
            "|", *fp_base, bumped.cast("string"), micros
        ).alias("fp"),
    )
    # shuffle_hash on the B side: Spark supports hash-based full outer
    # joins (3.1+), and the SMJ this planned as paid a full sort of BOTH
    # events-sized snapshot sides on top of the two unavoidable key
    # exchanges (guide §3.1 — same finding as the minhash/jaccard SHJ
    # A/Bs). Build-side memory is one snapshot's (event_id, fp) pairs
    # per partition, AQE-splittable.
    aa, bb = a.alias("a"), b.hint("shuffle_hash").alias("b")
    j = aa.join(bb, F.col("a.event_id") == F.col("b.event_id"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("b.event_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_only_a"),
        F.sum(F.when(F.col("a.event_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_only_b"),
        F.sum(
            F.when(
                F.col("a.event_id").isNotNull()
                & F.col("b.event_id").isNotNull()
                & (F.col("a.fp") != F.col("b.fp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("a.fp") == F.col("b.fp"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_identical"),
    )
