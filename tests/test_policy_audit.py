"""The finite-domain policy audit as a tripwire (pure text scan — no
Spark session): no UNREVIEWED hazard mention may feed an exact-domain
sink, and every reviewed allowlist row must still correspond to a live
textual hit (a stale review row hides the next real one behind it)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import policy_audit  # noqa: E402


def _sink_rows():
    return [(n, c, sinks) for n, c, _, _, _, sinks in policy_audit.audit_rows()
            if sinks]


def test_no_unreviewed_exact_domain_sink():
    """r08 verdict item 5: policy_audit shows no raw consumption
    feeding a decimal cast, percentile, bin, or render. Every textual
    hit must be a reviewed alias-reuse / pattern-false-match row."""
    unreviewed = [(n, c, s) for n, c, s in _sink_rows()
                  if (n, c) not in policy_audit.REVIEWED_SINKS]
    assert unreviewed == [], (
        "unreviewed exact-domain sink consumption — guard the ingestion "
        f"point or review it into REVIEWED_SINKS: {unreviewed}")


def test_reviewed_sink_rows_still_trip():
    live = {(n, c) for n, c, _ in _sink_rows()}
    stale = [k for k in policy_audit.REVIEWED_SINKS if k not in live]
    assert stale == [], f"stale REVIEWED_SINKS rows (oracle refactored): {stale}"


def test_sink_detector_sees_through_nesting():
    """The detector itself: an unguarded hazard inside a nested
    exact-domain cast must be caught; a TRY_CAST guard idiom (stripped
    before detection) and a double-domain cast must not."""
    assert policy_audit.exact_domain_sinks(
        "SELECT CAST(SUM(o_totalprice * 2) AS DECIMAL(18,2)) FROM orders",
        r"o_totalprice") == ["decimal-or-int-cast"]
    assert policy_audit.exact_domain_sinks(
        "SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity)",
        r"l_quantity") == ["percentile"]
    assert policy_audit.exact_domain_sinks(
        "SELECT FLOOR(c_acctbal / 100) FROM customer", r"c_acctbal") == ["bin"]
    # double-domain cast: stays IEEE, not a sink
    assert policy_audit.exact_domain_sinks(
        "SELECT CAST(l_tax AS DOUBLE) FROM lineitem", r"l_tax") == []
    # ROUND is not a render sink (returns double, IEEE-identical)
    assert policy_audit.exact_domain_sinks(
        "SELECT ROUND(SUM(s_acctbal), 2) FROM supplier", r"s_acctbal") == []


def test_dec2dbl_routes_reviewed_and_fresh():
    """r12 decimal-edge class as a standing tripwire: every oracle
    CAST(decimal-bearing expr AS DOUBLE) is varchar-routed, round-rail,
    or a REVIEWED direct site — a new direct site (or a stale review
    row) must fail here before a fuzz seed has to find it."""
    import policy_audit as PA

    rows = PA.dec2dbl_rows()
    direct = {name for name, cls, _ in rows if cls == "DIRECT"}
    assert direct <= set(PA.REVIEWED_DEC2DBL), (
        f"unreviewed direct decimal->double sites: "
        f"{sorted(direct - set(PA.REVIEWED_DEC2DBL))}"
    )
    stale = set(PA.REVIEWED_DEC2DBL) - direct
    assert not stale, f"stale dec2dbl review rows: {sorted(stale)}"
    # the VARCHAR route exists and is in use (twap/cuped/OLS family)
    routed = {name for name, cls, _ in rows if cls == "varchar-routed"}
    assert "timeseries_twap_user" in routed
    assert "ab_test_cuped_adjusted" in routed
