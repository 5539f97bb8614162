"""Driver-row freshness ledger and next-window planner.

The per-round driver checks a 50-entry prefix of ``queries()`` against
the DuckDB oracles and records the rows in ``CORRECTNESS_r{N}.json``.
Entries not in the window keep their last green row, which AGES — and
entries whose implementation or oracle changed need fresh rows
regardless of age. This tool turns the round-start planning ritual into
one command:

    python tools/freshness.py            # ledger: latest round per entry
    python tools/freshness.py --plan     # proposed next 50-entry window
    python tools/freshness.py --plan --changed a,b,c
                                         # changed entries head the window

The proposal is the policy every round has followed by hand: (1) entries
whose code/oracle changed this round (pass via --changed), (2) the
oldest driver rows, oldest round first then alphabetical, (3) entries
with NO driver row yet (new this round), ahead of everything except
changed ones. Oracle-less entries are listed but never windowed (the
driver records only rows-only checks for them).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WINDOW = 50


def load_ledger() -> dict[str, int]:
    """entry -> latest round with a driver row (any color — the driver
    re-runs reds too, and a red's existence still dates the check)."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(f))
        except json.JSONDecodeError:
            continue
        if not isinstance(rows, dict):  # malformed-but-valid JSON: skip like a parse error
            print(f"# warning: skipping non-dict artifact {os.path.basename(f)}", file=sys.stderr)
            continue
        rows = rows.get("rows", rows)  # driver_sim wraps; driver doesn't
        if not isinstance(rows, dict):
            print(f"# warning: skipping non-dict rows in {os.path.basename(f)}", file=sys.stderr)
            continue
        for name in rows:
            if name == "meta":
                continue
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", action="store_true", help="propose the next window")
    ap.add_argument("--changed", default="", help="comma list of changed entries")
    args = ap.parse_args()

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    names = list(entry.queries())
    ledger = load_ledger()

    dist = Counter(ledger.get(n, 0) for n in names)
    print("# latest-driver-row distribution (0 = never checked):")
    for rnd in sorted(dist):
        print(f"#   r{rnd:02d}: {dist[rnd]}")

    never = [n for n in names if n not in ledger]
    no_oracle = [n for n in names if n not in oracles]
    if never:
        print(f"# never checked: {sorted(never)}")
    if no_oracle:
        print(f"# oracle-less (never windowable): {sorted(no_oracle)}")

    if not args.plan:
        for n in sorted(names, key=lambda n: (ledger.get(n, 0), n)):
            print(f"{ledger.get(n, 0):3d}  {n}")
        return

    changed = [n.strip() for n in args.changed.split(",") if n.strip()]
    bad = [n for n in changed if n not in names]
    if bad:
        sys.exit(f"unknown changed entries: {bad}")

    eligible = [n for n in names if n in oracles]
    pool = [n for n in eligible if n not in changed]
    # new (never-checked) entries first, then oldest rows
    pool.sort(key=lambda n: (ledger.get(n, 0), n))
    window = [n for n in changed if n in oracles] + pool
    window = window[:WINDOW]
    print(f"\n# proposed _DRIVER_WINDOW ({len(window)} entries):")
    print("_DRIVER_WINDOW = [")
    for n in window:
        tag = "changed" if n in changed else (
            "NEW" if n not in ledger else f"r{ledger[n]:02d}"
        )
        print(f'    "{n}",  # {tag}')
    print("]")
    leftover = [n for n in eligible if n not in window]
    oldest_left = sorted(leftover, key=lambda n: (ledger.get(n, 0), n))[:15]
    print(f"# {len(leftover)} eligible entries left out; oldest 15: {oldest_left}")


if __name__ == "__main__":
    main()
