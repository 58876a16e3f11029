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
    """The DuckDB-side twin of :func:`round_to` (same IEEE ops)."""
    m = 10**d
    return f"(floor(({expr}) * {m}.0 + 0.5) / {m}.0)"
