"""Portable cross-engine hashing: md5-hex prefix -> bigint.

The ONE definition of the parity-critical idiom used by the dedup,
fingerprint, and sampling families. Width is capped at 15 hex chars
(60 bits) because 16 would overflow a signed bigint — a silent
divergence if any site widened it independently, which is why this
lives in one place with its DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_HEX = 15  # 60 bits; 16 hex chars can exceed signed-bigint range


def md5_bigint(col: Column, hex_chars: int = MAX_HEX) -> Column:
    """First ``hex_chars`` of md5(col) as a non-negative bigint —
    bit-identical to :func:`sql_md5_bigint` in DuckDB."""
    assert 1 <= hex_chars <= MAX_HEX
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def sql_md5_bigint(expr: str, hex_chars: int = MAX_HEX) -> str:
    """DuckDB twin of :func:`md5_bigint`."""
    assert 1 <= hex_chars <= MAX_HEX
    return f"('0x' || substr(md5({expr}), 1, {hex_chars}))::BIGINT"
