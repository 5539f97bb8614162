"""bench.py regression-detector contract (r08 verdict item 1).

The r08 detector parsed the driver's head-truncated BENCH_r07 tail to an
empty dict and certified a +19% regressing bench as flat with zero
flags. These tests pin the repaired behavior against the REAL committed
artifacts: extraction must survive (a) the driver wrapper's escaped-
string tail, (b) head truncation that cuts the line mid-token, and
(c) the clean full-payload local anchor — and an empty comparison must
surface as an explicit error, never as a zero-flag pass.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def test_extracts_norm_dict_from_truncated_driver_tail():
    # BENCH_r07.json is the artifact that blinded r08: its tail begins
    # mid-token. The normalized dict sits near the END of the stdout
    # line, so it survives head truncation and MUST be recovered.
    fields = bench._extract_bench_fields(_read("BENCH_r07.json"))
    norm = fields.get("queries_canary_normalized")
    assert norm and len(norm) >= 15
    assert norm.get("q1_pricing_summary") == 1.0


def test_extracts_from_untruncated_driver_wrapper():
    fields = bench._extract_bench_fields(_read("BENCH_r08.json"))
    assert len(fields.get("queries_canary_normalized", {})) >= 15
    assert fields.get("methodology", "").startswith("warmup-pass")


def test_extracts_full_payload_anchor():
    payload = {
        "queries_canary_normalized": {"qx": 2.0},
        "methodology": bench.METHODOLOGY,
        "queries": {"qx": 1.5},
    }
    fields = bench._extract_bench_fields(json.dumps(payload))
    assert fields["queries_canary_normalized"] == {"qx": 2.0}
    assert fields["methodology"] == bench.METHODOLOGY


def test_prev_comparison_yields_nonempty_deltas_and_flags():
    # against the committed r08 artifact: a 30% normalized regression on
    # one query must be flagged; matching values delta to 0.
    norm = {"q1_pricing_summary": 1.0, "q5_local_supplier_volume": 3.33 * 1.3}
    block = bench._prev_comparison(norm)
    assert "error" not in block, block
    assert block["deltas"], "empty deltas is the r08 failure mode"
    assert "q5_local_supplier_volume" in block["flagged_over_25pct"]
    assert block["deltas"]["q1_pricing_summary"] == 0.0
    # r08 ran on the v2 basis despite its stale methodology string
    assert block["same_measurement_basis"] is True


def test_empty_comparison_is_an_error_not_a_pass():
    # queries that exist in NO prior artifact -> explicit error field
    block = bench._prev_comparison({"a_query_no_artifact_has": 1.0})
    assert "error" in block
    assert "deltas" not in block
