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
              bugs: every one is certified green under extremes seeds
              11/23/37, because the consumption is either a pure
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

import re
import sys

sys.path.insert(0, "/root/repo")

HAZARDS = {
    "o_totalprice": r"o_totalprice",
    "l_extendedprice": r"l_extendedprice",
    "events.value": r"\bvalue\b",
    "embedding": r"\bembedding\b",
}

GUARD_IDIOMS = {
    "o_totalprice": [r"isnan\(o_totalprice\)", r"TRY_CAST\(o_totalprice"],
    "l_extendedprice": [r"isnan\(l_extendedprice\)", r"TRY_CAST\(l_extendedprice"],
    "events.value": [r"isnan\(value\)", r"isfinite\(value\)", r"TRY_CAST\(value"],
    "embedding": [r"list_filter\(embedding,\s*x\s*->\s*x IS NULL OR NOT isfinite"],
}


def _classify(sql: str, col: str, pat: str) -> tuple[str, int, int]:
    """(tag, n_mentions, n_guarded_mentions) for one column in one
    oracle. Mention counting is textual: each guarded consumption spells
    the idiom as ``isnan(col) … TRY_CAST(col …) … THEN col END`` (three
    mentions per guard) or the list_filter form (one mention). A column
    whose mention count exceeds what its guard idioms account for is
    MIXED — it has raw consumptions alongside guarded ones, which is
    exactly the refactoring hazard this audit exists to flag."""
    mentions = len(re.findall(pat, sql))
    guards = sum(len(re.findall(g, sql)) for g in GUARD_IDIOMS[col])
    if guards == 0:
        return "RAW", mentions, 0
    # mentions accounted for by guard idioms: the scalar idiom touches
    # the column 3× per guard-pair (isnan + TRY_CAST counted in
    # `guards`, plus the THEN <col> END value mention); the vector
    # idiom (list_filter) touches it once and `guards` counts it once
    if col == "embedding":
        accounted = guards
    else:
        accounted = guards + guards // 2  # isnan+trycast pairs -> +1 THEN-mention each
    return ("GUARDED" if mentions <= accounted else "MIXED"), mentions, guards


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
            tag, mentions, guards = _classify(sql, col, pat)
            counts[tag] += 1
            rows.append((name, col, tag, mentions, guards))

    print("| entry | hazard column | policy | mentions | guard idioms |")
    print("|---|---|---|---|---|")
    for name, col, tag, mentions, guards in rows:
        print(f"| {name} | {col} | {tag} | {mentions} | {guards} |")
    total = sum(counts.values())
    print(
        f"\n# {total} (entry, column) consumptions: "
        f"{counts['GUARDED']} guarded, {counts['MIXED']} mixed "
        f"(guarded + extra raw mentions — review each), {counts['RAW']} raw "
        "(raw/mixed-extra = passthrough/IEEE-identical, certified by "
        "extremes seeds 11/23/37)"
    )


if __name__ == "__main__":
    main()
