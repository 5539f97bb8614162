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


def _write_prev(
    tmp_path,
    rnd: int,
    norm: dict,
    spread: dict | None = None,
    canary_sec: float | None = None,
    canary2_sec: float | None = None,
):
    """Synthesize a driver-wrapper artifact whose ``tail`` holds the
    stdout JSON line — the shape the driver actually deposits."""
    line: dict = {
        "methodology": bench.METHODOLOGY,
        "queries_canary_normalized": norm,
    }
    if spread is not None:
        line["queries_sample_spread"] = spread
    if canary_sec is not None:
        line["canary"] = {"name": "q1_pricing_summary", "sec": canary_sec}
    if canary2_sec is not None:
        line["canary2"] = {"name": "minhash_lsh_fixed_probe", "sec": canary2_sec}
    wrapper = {"n": rnd, "rc": 0, "tail": json.dumps(line) + "\n", "parsed": None}
    (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(json.dumps(wrapper))


def test_dual_canary_corrects_structural_canary_speedup(tmp_path):
    """r13 basis (r12 verdict item 4): q1 got structurally 2x faster
    (plan-build memo) while canary2 and the query under test did not
    move. Single-canary deltas read +100% fleet-wide; the dual-canary
    correction (divide by the LESS-moved canary's ratio) must bring the
    unmoved query's delta back to ~0 and flag nothing."""
    _write_prev(
        tmp_path, 42, {"q1_pricing_summary": 1.0, "qa": 2.0},
        canary_sec=0.4, canary2_sec=1.5,
    )
    # q1 halved (0.4 -> 0.2); qa raw unchanged at 0.8 s -> norm doubles
    norm = {"q1_pricing_summary": 1.0, "qa": 4.0}
    block = bench._prev_comparison(
        norm, artifact_dir=str(tmp_path),
        canary_sec=0.2, canary2_sec=1.5,
    )
    assert block["canary_basis"]["applied"] is True
    assert block["canary_basis"]["host_ratio_used"] == 1.0  # canary2 unmoved
    assert block["deltas_single_canary"]["qa"] == 1.0       # old basis: +100%
    assert block["deltas"]["qa"] == 0.0                     # corrected: flat
    # q1's own corrected delta now carries its TRUE movement (-50%) —
    # under the single-canary basis it was 0 by construction, hiding
    # exactly the structural canary change this basis exists to expose
    assert block["deltas"]["q1_pricing_summary"] == -0.5
    assert block["flagged_over_25pct"] == ["q1_pricing_summary"]
    assert "qa" not in block["flagged_subnoise_over_25pct"]


def test_dual_canary_ignores_the_mover_not_the_host(tmp_path):
    """A genuine uniform HOST slowdown moves BOTH canaries together; the
    correction must then be ~1 and deltas match the single-canary basis
    (host movement already cancels inside the normalization)."""
    _write_prev(
        tmp_path, 42, {"q1_pricing_summary": 1.0, "qa": 2.0},
        canary_sec=0.4, canary2_sec=1.5,
    )
    # host 1.5x slower: q1 0.6, c2 2.25, qa raw 0.8 -> 1.2, norm stays 2.0
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qa": 2.0}, artifact_dir=str(tmp_path),
        canary_sec=0.6, canary2_sec=2.25,
    )
    assert block["canary_basis"]["applied"] is True
    assert abs(block["canary_basis"]["correction"] - 1.0) < 1e-9
    assert block["deltas"]["qa"] == 0.0


def test_canary_secs_survive_tail_truncation():
    """The early canary/canary2 dicts are eaten by the driver's
    2000-byte tail (BENCH_r12.json lost them); the tail-region
    ``canaries_sec`` duplicate must be extractable from a tail cut
    mid-line ahead of it."""
    line = json.dumps(
        {
            "queries_sample_spread": {"qa": 0.1},
            "canaries_sec": {"canary_sec": 0.41, "canary2_sec": 1.52},
            "methodology": bench.METHODOLOGY,
            "queries_canary_normalized": {"qa": 2.0},
        }
    )
    # head truncation mid-token, cutting into the spread dict just ahead
    # of the canaries (the 2000-byte tail keeps the final ~1.1 KB whole)
    tail = line[line.index('"qa"') + 2 :]
    fields = bench._extract_bench_fields(json.dumps({"tail": tail, "n": 13}))
    assert fields["canary_sec"] == 0.41
    assert fields["canary2_sec"] == 1.52


def test_dual_canary_falls_back_without_prev_canary_secs(tmp_path):
    """Truncated prev artifacts without canary seconds keep the old
    single-canary basis (correction off, deltas identical)."""
    _write_prev(tmp_path, 42, {"q1_pricing_summary": 1.0, "qa": 2.0})
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qa": 2.6}, artifact_dir=str(tmp_path),
        canary_sec=0.2, canary2_sec=1.5,
    )
    assert block["canary_basis"]["applied"] is False
    assert block["deltas"] == block["deltas_single_canary"]
    assert block["deltas"]["qa"] == 0.3


def test_prev_comparison_yields_nonempty_deltas_and_flags(tmp_path):
    # HERMETIC (r09 verdict item 1): the old version globbed the repo's
    # newest BENCH_r*.json and hard-coded r08 values, so the driver's
    # own artifact deposit re-broke it every round. Now the prev
    # artifact is synthesized into tmp_path and the glob root injected.
    _write_prev(tmp_path, 42, {"q1_pricing_summary": 1.0, "q5_local_supplier_volume": 3.33})
    norm = {"q1_pricing_summary": 1.0, "q5_local_supplier_volume": 3.33 * 1.3}
    block = bench._prev_comparison(norm, artifact_dir=str(tmp_path))
    assert "error" not in block, block
    assert block["deltas"], "empty deltas is the r08 failure mode"
    assert "q5_local_supplier_volume" in block["flagged_over_25pct"]
    assert block["deltas"]["q1_pricing_summary"] == 0.0
    assert block["same_measurement_basis"] is True


def test_prev_comparison_picks_newest_artifact(tmp_path):
    _write_prev(tmp_path, 2, {"qa": 1.0})
    _write_prev(tmp_path, 10, {"qa": 2.0})  # lexicographic sort would pick r02
    block = bench._prev_comparison({"qa": 2.0}, artifact_dir=str(tmp_path))
    assert block["prev_artifact"] == "BENCH_r10.json"
    assert block["deltas"]["qa"] == 0.0


def test_variance_floor_demotes_subnoise_flags(tmp_path):
    # r09 verdict item 2: a +30% delta whose magnitude does not clear
    # this run's sample spread (+ the prev artifact's recorded spread)
    # is a measurement, not a regression — it must land in the subnoise
    # list, never the attributable flag list.
    _write_prev(
        tmp_path,
        42,
        {"q_noisy": 2.0, "q_quiet": 2.0},
        spread={"q_noisy": 0.15, "q_quiet": 0.0},
    )
    norm = {"q_noisy": 2.6, "q_quiet": 2.6}  # both +30%
    block = bench._prev_comparison(
        norm,
        artifact_dir=str(tmp_path),
        spreads={"q_noisy": 0.20, "q_quiet": 0.01},
    )
    # q_noisy: noise = 0.20 + 0.15 = 0.35 > 0.30 -> subnoise
    # q_quiet: noise = 0.01 + 0.00 = 0.01 < 0.30 -> real flag
    assert block["flagged_over_25pct"] == ["q_quiet"]
    assert block["flagged_subnoise_over_25pct"] == ["q_noisy"]


def test_canary_spread_joins_every_noise_term(tmp_path):
    # The canary divides every normalized value, so ITS sample spread
    # (either run's) is noise on every delta: a +30% delta on a query
    # whose own samples were tight must still demote to subnoise when
    # the canary drew a lucky best-of-2 (r10 freeze-run finding).
    _write_prev(
        tmp_path, 42, {"q1_pricing_summary": 1.0, "qx": 2.0},
        spread={"q1_pricing_summary": 0.0, "qx": 0.0},
    )
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qx": 2.6},
        artifact_dir=str(tmp_path),
        spreads={"q1_pricing_summary": 0.38, "qx": 0.01},
    )
    assert block["flagged_subnoise_over_25pct"] == ["qx"]
    assert block["flagged_over_25pct"] == []


def test_canary_noise_key_follows_fallback_canary(tmp_path):
    # r10 advice: the noise term hard-coded 'q1_pricing_summary' while
    # the canary pick falls back to min(timings) when q1 is absent — in
    # that fallback the real canary's spread silently left every noise
    # budget. The noise key must follow the SAME name main() divided by.
    _write_prev(
        tmp_path, 42, {"q_canary": 1.0, "qx": 2.0},
        spread={"q_canary": 0.0, "qx": 0.0},
    )
    block = bench._prev_comparison(
        {"q_canary": 1.0, "qx": 2.6},
        artifact_dir=str(tmp_path),
        spreads={"q_canary": 0.38, "qx": 0.01},
        canary_name="q_canary",
    )
    assert block["flagged_subnoise_over_25pct"] == ["qx"]
    assert block["flagged_over_25pct"] == []


def test_prev_canary_name_extracted_from_prev_artifact():
    # The PREV run's spread lookup uses the canary name recorded in the
    # prev artifact itself (it may differ from this run's fallback pick).
    raw = json.dumps(
        {"canary": {"name": "q_other", "sec": 1.5}, "queries": {"q_other": 1.5}}
    )
    assert bench._extract_bench_fields(raw)["canary_name"] == "q_other"


def test_plain_run_output_path_is_not_the_committed_anchor():
    # r10 verdict item 3: a driver bench run must leave `git status`
    # clean — the default write target is the gitignored LATEST path,
    # and the committed anchor moves only under --promote-anchor.
    assert os.path.basename(bench.LATEST_OUT) == "BENCH_LATEST.json"
    assert os.path.basename(bench.LOCAL_ANCHOR) == "BENCH_LOCAL.json"
    with open(os.path.join(REPO, ".gitignore")) as f:
        assert "BENCH_LATEST.json" in f.read()
    # and the anchor path appears in main() only behind the flag
    import inspect

    src = inspect.getsource(bench.main)
    assert "--promote-anchor" in src


def test_empty_comparison_is_an_error_not_a_pass(tmp_path):
    # queries that exist in NO prior artifact -> explicit error field;
    # hermetic via an artifact dir containing one non-overlapping prev
    _write_prev(tmp_path, 42, {"some_other_query": 1.0})
    block = bench._prev_comparison(
        {"a_query_no_artifact_has": 1.0}, artifact_dir=str(tmp_path)
    )
    assert "error" in block
    assert "deltas" not in block


def test_compact_stdout_line_fits_driver_tail():
    # r13 verdict item 2: the one-line stdout JSON must survive the
    # driver's 2000-byte tail WHOLE. Build the compact payload with the
    # REAL headline-query names and worst-case numeric widths (999.999 s
    # timings, 9.999 spreads) and assert the serialized line fits with
    # margin for a handful of future query additions.
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    headline = [n for n, qd in QUERIES.items() if qd.headline]
    assert len(headline) >= 18
    payload = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: 999.999 for n in headline},
        "sf": 0.1,
        "canary": {"name": "q1_pricing_summary", "sec": 999.999},
        "canary2": {"name": "minhash_lsh_fixed_probe", "sec": 999.999, "spread": 9.999},
        "queries_sample_spread": {n: 9.999 for n in headline},
        "methodology": bench.METHODOLOGY,
    }
    line = json.dumps(bench._compact_stdout_payload(payload), separators=(",", ":"))
    assert len(line.encode()) < 1900, len(line.encode())  # 100 B headroom under 2000
    # and the compact subset keeps the driver's one-line contract fields
    got = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in got


def test_detector_derives_norm_from_compact_v4_line(tmp_path):
    # v4 artifacts no longer print queries_canary_normalized; the
    # detector must derive it from queries + the canary dict's sec —
    # a full comparison against a compact-line prev artifact engages.
    line = {
        "metric": "headline_queries_total",
        "value": 1.2,
        "unit": "sec",
        "queries": {"q1_pricing_summary": 0.4, "qa": 0.8},
        "sf": 0.1,
        "canary": {"name": "q1_pricing_summary", "sec": 0.4},
        "canary2": {"name": "minhash_lsh_fixed_probe", "sec": 1.5, "spread": 0.02},
        "queries_sample_spread": {"q1_pricing_summary": 0.0, "qa": 0.0},
        "methodology": bench.METHODOLOGY,
    }
    wrapper = {"n": 42, "rc": 0, "tail": json.dumps(line, separators=(",", ":")) + "\n"}
    (tmp_path / "BENCH_r42.json").write_text(json.dumps(wrapper))
    fields = bench._extract_bench_fields((tmp_path / "BENCH_r42.json").read_text())
    assert fields["queries_canary_normalized"] == {"q1_pricing_summary": 1.0, "qa": 2.0}
    assert fields["canary2_spread"] == 0.02
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qa": 2.0},
        artifact_dir=str(tmp_path),
        canary_sec=0.4,
        canary2_sec=1.5,
    )
    assert block["canary_basis"]["applied"] is True
    assert block["deltas"]["qa"] == 0.0
    assert block["same_measurement_basis"] is True


def test_canary2_spread_joins_noise_when_it_is_the_host_witness(tmp_path):
    # r13 advice: when the dual-canary correction flows through canary2
    # (host witness = r2), canary2's best-of variance enters every
    # corrected delta — a flag that does not clear it must demote.
    _write_prev(
        tmp_path, 42, {"q1_pricing_summary": 1.0, "qx": 2.0},
        spread={"q1_pricing_summary": 0.0, "qx": 0.0},
        canary_sec=0.4, canary2_sec=1.5,
    )
    # q1 halves (structural), canary2 flat -> host witness is canary2,
    # correction = 0.5; qx raw flat => single delta +100%, corrected 0.
    # Make qx corrected delta +30% instead (raw 0.8 -> 1.04) and give
    # THIS run's canary2 a 0.4 spread: noise 0.4 > 0.3 -> subnoise.
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qx": 5.2},
        artifact_dir=str(tmp_path),
        spreads={"q1_pricing_summary": 0.0, "qx": 0.0},
        canary_sec=0.2, canary2_sec=1.5, canary2_spread=0.4,
    )
    assert block["canary_basis"]["applied"] is True
    assert block["canary_basis"]["host_ratio_used"] == 1.0
    assert block["deltas"]["qx"] == 0.3
    assert "qx" in block["flagged_subnoise_over_25pct"]
    # without canary2's spread the same delta would have been flagged
    block2 = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qx": 5.2},
        artifact_dir=str(tmp_path),
        spreads={"q1_pricing_summary": 0.0, "qx": 0.0},
        canary_sec=0.2, canary2_sec=1.5, canary2_spread=0.0,
    )
    assert "qx" in block2["flagged_over_25pct"]


def test_descend_to_flat_sampling_policy():
    # v4: extra attempts trigger on (a) >25% disagreement of the first
    # two samples (the v3 rule) or (b) the newest sample being a >5% new
    # minimum (still descending the JIT decay curve). Converged or
    # noisy-but-flat series stop immediately.
    need = bench._needs_another_sample
    assert need([3.3, 2.0]) is True            # v3 spread rule
    assert need([2.72, 2.50]) is True          # v4: -8% new min, still descending
    assert need([1.00, 0.99]) is False         # flat within noise
    assert need([1.00, 1.20]) is False         # slower second sample, agrees
    assert need([2.72, 2.50, 1.88]) is True    # the r14 minhash decay curve
    assert need([2.72, 2.50, 1.88, 1.87]) is False  # plateaued -> stop
    assert need([1.0, 0.9, 0.95]) is False     # newest not a new min
    assert bench._MAX_ATTEMPTS == 5            # hard cap documented


def test_low_core_artifacts_never_chosen_as_prev(tmp_path):
    # The driver deposits BENCH_r13_c8.json (8-core scaling run) next to
    # BENCH_r13.json; the round-number sort key ties and a stable-sort
    # coin flip could compare a 32-core run against 8-core numbers.
    # Only exact BENCH_r<d>.json names are comparison candidates.
    _write_prev(tmp_path, 13, {"q1_pricing_summary": 1.0, "qa": 2.0})
    # an 8-core artifact of the SAME round with wildly different values
    line = {"methodology": bench.METHODOLOGY,
            "queries_canary_normalized": {"q1_pricing_summary": 1.0, "qa": 99.0}}
    wrapper = {"n": 13, "rc": 0, "tail": json.dumps(line) + "\n"}
    (tmp_path / "BENCH_r13_c8.json").write_text(json.dumps(wrapper))
    block = bench._prev_comparison(
        {"q1_pricing_summary": 1.0, "qa": 2.0}, artifact_dir=str(tmp_path)
    )
    assert block["prev_artifact"] == "BENCH_r13.json"
    assert block["deltas"]["qa"] == 0.0
