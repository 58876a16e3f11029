"""Central registry of session memos (cached canonical DataFrames).

Several query families derive one expensive canonical intermediate that
multiple registered queries consume — ml/recommend's ratings + cosine
pairs (ML9), and the simhash near-dup pair set (listing + its two
bounded twins). Production runs the derivation once; the memos express
that: keyed ``(applicationId, sf_dir)``, cached, reused within a
session.

The hygiene contract that makes this safe (learned over r6–r9):
- memos hold PARAMETERLESS canonical derivations only — a forced or
  parameterized variant must never be served from, or stored into, one;
- plan-audit mode (``SPARK_GRAFT_NO_CHECKPOINT``) bypasses them (a
  cache is a materialization barrier that hides the pipeline from
  ``.explain``);
- every memo dict registers HERE, and long-lived drivers call
  ``clear_all()`` between pipeline blocks (bench.py does) so nothing
  pins executor memory past its block. An unregistered free-floating
  ``.cache()`` is exactly the r8-advice leak class this registry
  exists to prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: list[dict] = []

#: Count of memo lookups served warm since the last ``consume_warm_hits``
#: — bench.py brackets each timed attempt with it so the compact artifact
#: can flag queries whose measured time rode a pre-derived memo instead
#: of paying the derivation (the r9 verdict's attribution gap: a 0.23s
#: memo-warm reading must not be read as standalone query cost).
_WARM_HITS = 0


def register_memo(memo: dict) -> dict:
    """Track a memo dict for session-hygiene clearing; returns it."""
    _REGISTRY.append(memo)
    return memo


def note_warm_hit() -> None:
    """Called by every memo consumer when a lookup returns a cached
    frame (never on the populate path)."""
    global _WARM_HITS
    _WARM_HITS += 1


def consume_warm_hits() -> int:
    """Return the warm-hit count since the previous call and reset it."""
    global _WARM_HITS
    n = _WARM_HITS
    _WARM_HITS = 0
    return n


def memo_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(applicationId, dir): unlike id(spark), a stopped session's key
    can never collide with a new session reusing the same address, and
    the key itself holds no reference to the session."""
    return (spark.sparkContext.applicationId, sf_dir)


def evict_other_sessions(key: tuple[str, str]) -> None:
    """Drop entries from any OTHER application in every registered
    memo: cached DataFrames pin their (possibly stopped) SparkSession,
    so the memos hold at most the live session's frames. Plain del —
    a dead session's blocks died with its executors."""
    for memo in _REGISTRY:
        for k in [k for k in memo if k[0] != key[0]]:
            del memo[k]


def clear_all() -> None:
    """Session-teardown / bench-cleanup hook: unpersist and forget
    every memoized frame in every registered memo (best-effort — a
    stopped session raises on unpersist, which is fine because its
    blocks died with it)."""
    for memo in _REGISTRY:
        for df in memo.values():
            if isinstance(df, DataFrame):
                try:
                    df.unpersist(False)
                except Exception:  # noqa: BLE001 - teardown must not raise
                    pass
        memo.clear()
