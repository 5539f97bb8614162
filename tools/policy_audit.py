"""Finite-domain policy audit: where do the four hazard columns enter
the catalog, and which entries carry an explicit guard?

The extremes regime (driver_sim --perturb-extremes) seeds IEEE specials
and overflow magnitudes into events.value, orders.o_totalprice,
lineitem.l_extendedprice, and embeddings.embedding. This audit scans
every catalog ORACLE (the SQL is the entry's declared semantics) and
classifies each (entry, column) consumption as:

- GUARDED   — the oracle spells the policy idiom for that column
              (isnan-guarded TRY_CAST / isfinite / list_filter-isfinite)
- RAW       — the column is consumed without a guard. These are NOT
              bugs: every one is certified green under the extremes
              seeds named in COVERAGE.md's closing certification,
              because the consumption is either a pure
              passthrough/projection (both engines surface the same
              special and the driver's NaN-equal compare accepts it) or
              arithmetic whose special-value result is IEEE-identical
              on both engines. The audit exists so the distinction is
              DECLARED, not accidental: a refactor that moves a RAW
              column into an exact domain (decimal cast, percentile,
              render, bin) must add the guard or the extremes sweep
              goes red.

Usage: python tools/policy_audit.py   (pure text scan — no Spark)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAZARDS = {
    "o_totalprice": r"o_totalprice",
    "l_extendedprice": r"l_extendedprice",
    "events.value": r"\bvalue\b",
    "embedding": r"\bembedding\b",
    # ring 2 (r09): the remaining double columns — the extremes regime
    # now seeds specials into every one of these too
    "l_quantity": r"l_quantity",
    "l_discount": r"l_discount",
    "l_tax": r"l_tax",
    "c_acctbal": r"c_acctbal",
    "s_acctbal": r"s_acctbal",
    "p_retailprice": r"p_retailprice",
}

def _scalar_idioms(col: str) -> list[str]:
    return [
        rf"isnan\({col}\)",
        rf"TRY_CAST\({col}",
        rf"isfinite\({col}\)",
    ]


GUARD_IDIOMS = {
    "o_totalprice": _scalar_idioms("o_totalprice"),
    "l_extendedprice": _scalar_idioms("l_extendedprice"),
    "events.value": _scalar_idioms("value"),
    "embedding": [r"list_filter\(embedding,\s*x\s*->\s*x IS NULL OR NOT isfinite"],
    "l_quantity": _scalar_idioms("l_quantity"),
    "l_discount": _scalar_idioms("l_discount"),
    "l_tax": _scalar_idioms("l_tax"),
    "c_acctbal": _scalar_idioms("c_acctbal"),
    "s_acctbal": _scalar_idioms("s_acctbal"),
    "p_retailprice": _scalar_idioms("p_retailprice"),
}


# Idiom SPANS stripped from the SQL before counting leftover mentions.
# Each pattern contains exactly the column mentions the guard idiom
# itself spells, so whatever survives the strip is a mention OUTSIDE any
# guard — an alias reuse or a genuinely raw consumption (both -> MIXED
# when a guard is also present; human review decides which).
_STRIP = {
    "scalar": [
        r"isnan\(\s*{col}\s*\)",
        r"TRY_CAST\(\s*(?:TRUNC\()?\s*{col}",
        r"THEN\s+{col}\s+END",
        r"isfinite\(\s*{col}\s*\)",
        # the binned_histogram clamp — valid only directly inside the
        # isfinite CASE guard (r09): LEAST(GREATEST(col, 0), top)
        r"THEN\s+CAST\(FLOOR\(\s*LEAST\(GREATEST\(\s*{col}\s*,\s*0\s*\)",
    ],
    "embedding": [
        r"list_filter\(embedding,\s*x\s*->\s*x IS NULL OR NOT isfinite\(x\)\)",
    ],
}


def _classify(sql: str, col: str, pat: str) -> tuple[str, int, int]:
    """(tag, n_mentions, n_unguarded_mentions). GUARDED means EVERY
    mention of the column sits inside a guard idiom span (strip the
    spans, nothing is left); MIXED means a guard exists but extra
    mentions survive the strip (alias reuse or raw consumption — the
    refactoring hazard this audit flags); RAW means no guard at all.
    Unlike a fixed per-idiom allowance, span-stripping leaves NO slack:
    one raw consumption added to a fully-guarded oracle flips it to
    MIXED."""
    mentions = len(re.findall(pat, sql))
    guards = sum(len(re.findall(g, sql)) for g in GUARD_IDIOMS[col])
    strips = _STRIP["embedding"] if col == "embedding" else [
        s.format(col=re.escape(col) if col != "events.value" else r"value")
        for s in _STRIP["scalar"]
    ]
    stripped = sql
    for s in strips:
        stripped = re.sub(s, "", stripped)
    leftover = len(re.findall(pat, stripped))
    if guards == 0:
        return "RAW", mentions, leftover
    return ("GUARDED" if leftover == 0 else "MIXED"), mentions, leftover


def main() -> None:
    # import via the package (no Spark session needed to read oracles)
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    counts = {"GUARDED": 0, "RAW": 0, "MIXED": 0}
    rows = []
    for name, qd in QUERIES.items():
        sql = qd.oracle
        if not sql:
            continue
        for col, pat in HAZARDS.items():
            if col == "events.value" and "FROM events" not in sql and "events " not in sql:
                continue
            if not re.search(pat, sql):
                continue
            tag, mentions, leftover = _classify(sql, col, pat)
            counts[tag] += 1
            rows.append((name, col, tag, mentions, leftover))

    print("| entry | hazard column | policy | mentions | outside guards |")
    print("|---|---|---|---|---|")
    for name, col, tag, mentions, leftover in rows:
        print(f"| {name} | {col} | {tag} | {mentions} | {leftover} |")
    total = sum(counts.values())
    print(
        f"\n# {total} (entry, column) consumptions: "
        f"{counts['GUARDED']} guarded (every mention inside a guard idiom), "
        f"{counts['MIXED']} mixed (guard present + mentions outside it — "
        f"alias reuse or raw; review each), {counts['RAW']} raw "
        "(raw/mixed-extra = passthrough/IEEE-identical, certified by "
        "the extremes seeds in COVERAGE.md's closing certification)"
    )


if __name__ == "__main__":
    main()
