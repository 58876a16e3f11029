"""Cross-engine-deterministic rounding.

Spark's ``round`` rounds the shortest decimal representation HALF_UP
(BigDecimal.valueOf), DuckDB's ``ROUND`` rounds the binary double —
they disagree on exact decimal halfway values (e.g. AVG of 2-decimal
data over a 200-row group hitting 48.62575). Both engines evaluate
``floor(x * 10^d + 0.5) / 10^d`` with identical IEEE semantics, so
every rounded measure in the query registry uses this form on BOTH
sides of the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_to(col: Column, d: int) -> Column:
    """Half-up-ish rounding computed purely in double arithmetic."""
    m = float(10**d)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def sql_round(expr: str, d: int) -> str:
    """The SQL twin of :func:`round_to` (same IEEE ops). The divisor is
    CAST to DOUBLE so the text is valid in BOTH engines: Spark SQL
    parses a bare ``100.0`` literal as DECIMAL, and ``floor()`` (BIGINT
    in Spark) divided by a decimal literal yields a decimal column —
    the cast keeps the result a double everywhere."""
    m = 10**d
    return f"(floor(({expr}) * {m}.0 + 0.5) / CAST({m}.0 AS DOUBLE))"


# ---------------------------------------------------------------------------
# Order-independent SUM / AVG over fixed-decimal doubles.
#
# Naive SUM(double) accumulates in partition/fetch order, so its last
# ulp differs between engines and between runs of the SAME engine with
# a different split layout. For measures whose true values sit on a
# fixed decimal grid (prices = 2dp, quantities = integers), that ulp
# noise lands EXACTLY on the post-rounding boundary with non-trivial
# probability (observed once: supplier_rollup's avg_price flipped its
# 4th digit at sf0.1). The deterministic form: extract exact integer
# units per row (floor(x*10^dec + 0.5) — double error per row is
# ~1e-11 ulp, far below the 0.5 guard band), sum them EXACTLY as
# DECIMAL(38,0) (bigint would overflow a global 100 TB cents sum:
# ~6e11 rows x 1e7 cents/row ≈ 6e18 > int64 for dec>=4 products;
# decimal(38,0) has 20 digits of headroom, and DuckDB mirrors it with
# exact 128-bit accumulation), then divide once. Both engines perform
# identical integer arithmetic, so the result is bit-identical
# regardless of row order, partition count, or engine.
# ---------------------------------------------------------------------------


def to_units(col: Column, dec: int) -> Column:
    """Exact integer units of a fixed-``dec``-decimal double column."""
    m = float(10**dec)
    return F.floor(col * F.lit(m) + F.lit(0.5)).cast("decimal(38,0)")


def fixed_sum(col: Column, dec: int, d: int) -> Column:
    """Order-independent SUM of a ``dec``-decimal column, rounded to
    ``d`` digits (drop-in for ``round_to(F.sum(col), d)``)."""
    m = float(10**dec)
    return round_to(F.sum(to_units(col, dec)) / F.lit(m), d)


def fixed_avg(col: Column, dec: int, d: int) -> Column:
    """Order-independent AVG of a ``dec``-decimal column, rounded to
    ``d`` digits (drop-in for ``round_to(F.avg(col), d)``). Uses
    COUNT(col) so NULL semantics match AVG."""
    m = float(10**dec)
    return round_to(F.sum(to_units(col, dec)) / (F.lit(m) * F.count(col)), d)


def sql_units(expr: str, dec: int) -> str:
    """SQL twin of :func:`to_units` — valid in Spark SQL and DuckDB."""
    m = 10**dec
    return f"CAST(floor(({expr}) * {m}.0 + 0.5) AS DECIMAL(38,0))"


def sql_fixed_sum(expr: str, dec: int, d: int) -> str:
    """SQL twin of :func:`fixed_sum` — valid in Spark SQL and DuckDB."""
    m = 10**dec
    return sql_round(f"SUM({sql_units(expr, dec)}) / CAST({m}.0 AS DOUBLE)", d)


def sql_fixed_avg(expr: str, dec: int, d: int) -> str:
    """SQL twin of :func:`fixed_avg` — valid in Spark SQL and DuckDB."""
    m = 10**dec
    return sql_round(
        f"SUM({sql_units(expr, dec)}) / (CAST({m}.0 AS DOUBLE) * COUNT({expr}))", d
    )
