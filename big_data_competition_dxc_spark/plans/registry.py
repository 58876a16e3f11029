"""Query registry: the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and the tests.

Each entry couples a PySpark implementation (spark, sf_dir) -> DataFrame
with an optional ANSI-SQL oracle string DuckDB can run over the same
parquet tables. Entries without an oracle (ML / streaming / Pandas-UDF
plumbing) get the driver's weaker rows-only check (SURVEY §5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryEntry:
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QueryEntry] = {}


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally paired with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryEntry(
            fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), bench=bench, tags=tags
        )
        return fn

    return deco
