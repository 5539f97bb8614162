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
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WINDOW = 50
CATALOG_REL = "alibaba_cppfeaturestore_spark/plans/catalog.py"


def last_round_commit() -> str | None:
    """Hash of the newest driver round-close commit ('round N: ...') —
    the baseline 'what changed this round' diffs against."""
    try:
        out = subprocess.run(
            ["git", "log", "--format=%H %s"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return None
    for line in out.splitlines():
        h, _, subj = line.partition(" ")
        if re.match(r"round \d+:", subj):
            return h
    return None


def entry_spans(catalog_src: str) -> list[tuple[int, int, str]]:
    """(start_line, end_line, entry_name) 1-based inclusive spans of each
    ``@_q(...)``-decorated entry in catalog.py: decorator line through
    the line before the next decorator (last entry runs to EOF). Lines
    before the first decorator are shared preamble (helpers/constants) —
    deliberately unattributed: a preamble edit potentially touches every
    entry and is certified by the full-catalog strict run, not by
    windowing all 200+ entries."""
    lines = catalog_src.splitlines()
    starts: list[tuple[int, str]] = []
    n_decorators = 0
    for i, line in enumerate(lines):
        if line.startswith("@_q("):
            n_decorators += 1
            # Scan forward past comment/blank lines to the first string
            # literal — a comment between `@_q(` and the name (r11
            # advice) must not silently merge the entry into the
            # previous span.
            m = re.search(r'"([^"]+)"', line)
            j = i + 1
            while m is None and j < len(lines):
                stripped = lines[j].strip()
                if stripped and not stripped.startswith("#"):
                    m = re.search(r'"([^"]+)"', lines[j])
                    break
                j += 1
            if m:
                starts.append((i + 1, m.group(1)))
    if len(starts) != n_decorators:
        raise ValueError(
            f"entry_spans: {n_decorators} @_q( decorators but only "
            f"{len(starts)} entry names parsed — a decorator's name "
            "string was not found (window-integrity gate would miss it)"
        )
    spans = []
    for k, (start, name) in enumerate(starts):
        end = starts[k + 1][0] - 1 if k + 1 < len(starts) else len(lines)
        spans.append((start, end, name))
    return spans


def git_touched_entries(ref: str) -> set[str]:
    """Catalog entries whose span intersects any line changed since
    ``ref`` (new-file coordinates from ``git diff -U0``). Pure deletions
    (+c,0 hunks) touch the boundary lines c and c+1, so a removed oracle
    clause still attributes to the entry it was removed from."""
    try:
        diff = subprocess.run(
            ["git", "diff", "-U0", ref, "--", CATALOG_REL],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return set()
    touched: set[int] = set()
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
        c = int(m.group(1))
        d = int(m.group(2)) if m.group(2) is not None else 1
        touched.update(range(c, c + d) if d else (c, c + 1))
    if not touched:
        return set()
    with open(os.path.join(REPO, CATALOG_REL)) as f:
        spans = entry_spans(f.read())
    return {
        name
        for start, end, name in spans
        if any(start <= ln <= end for ln in touched)
    }


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

    # r10 verdict item 8: the changed-set was assembled by hand and
    # missed three oracle-fixed entries. The planner now diffs catalog.py
    # against the last driver round-close commit itself and PROMOTES any
    # git-touched entry the hand list forgot — deliberate omissions must
    # be spelled in __spark_entry__._WINDOW_EXEMPT_CHANGED with a reason.
    exempt = getattr(entry, "_WINDOW_EXEMPT_CHANGED", {})
    base = last_round_commit()
    if base:
        auto = git_touched_entries(base)
        forgotten = sorted(
            (auto & set(names)) - set(changed) - set(exempt)
        )
        if forgotten:
            print(
                f"# auto-promoting git-touched entries missing from --changed: {forgotten}",
                file=sys.stderr,
            )
            changed += forgotten
        # The diff only sees catalog.py spans — an entry whose fix lives
        # in an operators/* module changes behavior invisibly (the r11
        # multimodal case: attach_binary_payload's pmod fix touched
        # three entries, only one of which had an oracle edit). Surface
        # the blind spot so the hand list covers it.
        try:
            other = subprocess.run(
                ["git", "diff", "--name-only", base, "--",
                 "alibaba_cppfeaturestore_spark"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.split()
            other = [p for p in other if p != CATALOG_REL]
            if other:
                print(
                    "# WARNING: non-catalog package files changed since the last "
                    f"round-close commit: {other} — entries whose BEHAVIOR those "
                    "files carry must be hand-listed in --changed (the span diff "
                    "cannot see them)",
                    file=sys.stderr,
                )
        except (OSError, subprocess.CalledProcessError):
            pass

    eligible = [n for n in names if n in oracles]
    pool = [n for n in eligible if n not in changed]
    # new (never-checked) entries first, then oldest rows
    pool.sort(key=lambda n: (ledger.get(n, 0), n))
    window = [n for n in changed if n in oracles] + pool
    window = window[:WINDOW]
    left_out = [n for n in changed if n in oracles and n not in window]
    if left_out:
        sys.exit(
            f"FAIL: changed entries do not fit the {WINDOW}-entry window: "
            f"{left_out} — shrink the changed set or split across rounds"
        )
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
