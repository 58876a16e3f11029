"""Stamp CONTRACTS.json from the latest driver CORRECTNESS record.

Run at ROUND START, before any edits: the driver's correctness gate ran
at the END of the previous round against the end-of-round commit, and a
new round starts from that same tree, so the CURRENT fingerprint of
every query sampled in the latest CORRECTNESS_r*.json is exactly the
fingerprint the driver proved. Stamping any later (after edits) would
record unproven code as proven; stamping from OLDER rounds' records is
unsound for the same reason (the tree may have changed in between), so
the default mode only consumes the latest file.

Protocol (see also tests/test_entry.py):
  round start:  python scripts/update_contracts.py        # stamp latest
  during round: edit freely — any edit to a stamped query's oracle or
                function source flips its fingerprint, and
                __spark_entry__._rotation_order ranks it stale-fail
                until the driver re-proves it. No hand bookkeeping.

``--bootstrap`` (one-time, round 8): seed entries from the latest
SUCCESSFUL record per query across the WHOLE history. Sound only at a
moment when every such query's current source equals its last-proven
source; the single known exception at bootstrap time
(stream_incremental_dedup: green r6, rewritten r7 with no later driver
row) is stamped with the sentinel fingerprint "unproven-rewrite" so it
ranks stale-fail until the driver re-proves it.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Queries known, at bootstrap time, to have been rewritten AFTER their
# latest driver-green (so current source != proven source). Stamped
# with a sentinel that can never match a real fingerprint.
BOOTSTRAP_UNPROVEN = {"stream_incremental_dedup"}

# Queries known, at rebase time, to sit in a fingerprint-algorithm
# blind spot (their helpers drifted without flipping the old hash),
# stamped with a sentinel so they rank stale-fail at the rotation
# front until the driver re-proves them. The r10 rebase carried the
# neardup family here (r9 verdict item 2); the driver re-proved all
# three hash-green in CORRECTNESS_r10, so the r11 rebase (const keys
# qualified by defining module) has no known blind-spot names.
REBASE_UNPROVEN: set[str] = set()


def _round_no(path: str) -> int:
    stem = os.path.basename(path)
    digits = "".join(ch for ch in stem if ch.isdigit())
    return int(digits) if digits else -1


def rebase() -> None:
    """One-time migration for a _fingerprint ALGORITHM change (r10: the
    hash became transitive over same-package callees). Recomputes every
    existing sidecar entry's fingerprint with the current algorithm,
    keeping proven_round. Soundness: an entry fresh under the OLD
    algorithm means its registered source + oracle are unchanged since
    proven; its helpers may have drifted, and the only known such set
    (audited in the r9 verdict) is REBASE_UNPROVEN, stamped with a
    sentinel so it ranks stale-fail. The same-round full sf0.1 sweep
    re-proves everything locally as the backstop for unknowns."""
    import __spark_entry__ as entrymod
    from big_data_competition_dxc_spark import plans

    contracts_path = os.path.join(HERE, entrymod.CONTRACTS_FILE)
    with open(contracts_path) as f:
        contracts = json.load(f)
    changed = 0
    for name in sorted(contracts):
        entry = plans.QUERIES.get(name)
        if entry is None:
            del contracts[name]
            continue
        fp = (
            "helper-edited"
            if name in REBASE_UNPROVEN
            else entrymod._fingerprint(entry)
        )
        if contracts[name].get("fingerprint") != fp:
            changed += 1
            contracts[name]["fingerprint"] = fp
    tmp = contracts_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(contracts, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, contracts_path)
    print(
        f"rebased {changed} fingerprints ({len(contracts)} total), "
        f"{len(REBASE_UNPROVEN)} force-staled: {sorted(REBASE_UNPROVEN)}"
    )


def main(bootstrap: bool = False) -> None:
    import __spark_entry__ as entrymod
    from big_data_competition_dxc_spark import plans

    history = sorted(
        glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")), key=_round_no
    )
    if not history:
        print("no CORRECTNESS history; nothing to stamp")
        return
    if not bootstrap:
        history = history[-1:]

    # latest successful record per name across the consumed files
    proven: dict[str, int] = {}
    latest_any: dict[str, bool] = {}
    for path in history:
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            continue
        rnd = _round_no(path)
        for name, rec in records.items():
            ok = entrymod._record_succeeded(rec)
            latest_any[name] = ok
            if ok:
                proven[name] = rnd
    # "latest record is a success" — a later failure supersedes an
    # earlier green (the rotation already ranks failures first; the
    # sidecar must not claim the old green still vouches).
    proven = {n: r for n, r in proven.items() if latest_any.get(n)}

    contracts_path = os.path.join(HERE, entrymod.CONTRACTS_FILE)
    try:
        with open(contracts_path) as f:
            contracts = json.load(f)
        if not isinstance(contracts, dict):
            contracts = {}
    except (OSError, ValueError):
        contracts = {}

    stamped = 0
    for name, rnd in sorted(proven.items()):
        entry = plans.QUERIES.get(name)
        if entry is None:  # renamed/retired query: drop stale entry
            contracts.pop(name, None)
            continue
        fp = (
            "unproven-rewrite"
            if bootstrap and name in BOOTSTRAP_UNPROVEN
            else entrymod._fingerprint(entry)
        )
        prev = contracts.get(name)
        if not isinstance(prev, dict) or prev.get("fingerprint") != fp:
            stamped += 1
        contracts[name] = {"fingerprint": fp, "proven_round": rnd}

    # invariant (r8 verdict item 3; pinned by tests/test_entry.py::
    # test_latest_green_queries_are_stamped): after stamping, every
    # latest-green registry query carries that round's proven_round.
    # Checked BEFORE the write (r9 advice): a violated invariant must
    # never persist an inconsistent sidecar, so the file lands via
    # temp+rename only after the check passes.
    lagging = [
        n
        for n, r in proven.items()
        if n in plans.QUERIES and contracts.get(n, {}).get("proven_round") != r
    ]
    if lagging:
        raise SystemExit(f"stamping invariant violated: {lagging}")
    tmp = contracts_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(contracts, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, contracts_path)
    print(
        f"stamped {stamped} changed / {len(proven)} proven entries "
        f"({len(contracts)} total) from {[os.path.basename(p) for p in history]}"
    )


if __name__ == "__main__":
    if "--rebase" in sys.argv[1:]:
        rebase()
    else:
        main(bootstrap="--bootstrap" in sys.argv[1:])
