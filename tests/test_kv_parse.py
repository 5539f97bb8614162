"""Golden tests for the Ali-CCP kv-triplet parser and bronze→silver plan.

Covers FIXTURES.md §1-3: parse semantics, LAST_WIN merge (common overrides
skeleton), invalid click/conversion filter, left-join dangling FKs, the
127 vs 127_14 quirk, and null columns for missing field ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.functions.kv import (
    merge_feature_maps,
    parse_kv_triplets,
)
from alibaba_cppfeaturestore_spark.plans.aliccp import (
    SILVER_COLUMNS,
    bronze_to_silver,
)


def kv(*triplets: tuple[str, str, str]) -> str:
    return "\x01".join(f"{a}\x02{b}\x03{c}" for a, b, c in triplets)


def test_parse_kv_triplets(spark):
    df = spark.createDataFrame(
        [(kv(("101", "1234", "1.0"), ("122", "5", "1.0"), ("124", "1", "1.0")),)],
        ["feat_list"],
    )
    out = df.select(parse_kv_triplets("feat_list").alias("m")).first()["m"]
    assert out == {"101": "1234", "122": "5", "124": "1"}


def test_parse_kv_malformed(spark):
    """Empty/ragged feat_lists must not crash map_from_arrays."""
    df = spark.createDataFrame(
        [("",), (None,), ("justonetoken",), ("a\x02b\x03c",)], ["feat_list"]
    )
    rows = df.select(parse_kv_triplets("feat_list").alias("m")).collect()
    assert rows[0]["m"] == {}
    assert rows[1]["m"] is None
    assert rows[2]["m"] == {}
    assert rows[3]["m"] == {"a": "b"}


def test_merge_last_win(spark):
    df = spark.createDataFrame([("x",)], ["dummy"])
    merged = df.select(
        merge_feature_maps(
            F.create_map(F.lit("a"), F.lit("skel"), F.lit("b"), F.lit("skel")),
            F.create_map(F.lit("a"), F.lit("common")),
        ).alias("m")
    ).first()["m"]
    # common features override skeleton on collisions (dict.update order)
    assert merged == {"a": "common", "b": "skel"}


def test_merge_null_map_is_empty(spark):
    df = spark.createDataFrame([("x",)], ["dummy"])
    merged = df.select(
        merge_feature_maps(
            F.create_map(F.lit("a"), F.lit("1")),
            F.lit(None).cast("map<string,string>"),
        ).alias("m")
    ).first()["m"]
    assert merged == {"a": "1"}


def _mk_bronze(spark):
    # common features: block b1 has user fields incl. the 127/127_14 quirk
    common = spark.createDataFrame(
        [
            ("b1", "4", kv(("101", "7", "1.0"), ("127", "2", "1.0"),
                           ("127_14", "33", "0.5"), ("122", "5", "1.0"))),
            ("b2", "1", kv(("101", "8", "1.0"))),
        ],
        ["_c0", "_c1", "_c2"],
    )
    skeleton = spark.createDataFrame(
        [
            # normal row; field 205=item, collision on 122 (common must win)
            ("1", "1", "0", "b1", "3",
             kv(("205", "900", "1.0"), ("206", "12", "1.0"), ("122", "999", "1.0"))),
            # invalid: click=0 & conversion=1 → dropped
            ("2", "0", "1", "b1", "1", kv(("205", "901", "1.0"))),
            # dangling FK → left join keeps row, user fields null
            ("3", "0", "0", "missing", "1", kv(("205", "902", "1.0"))),
        ],
        ["_c0", "_c1", "_c2", "_c3", "_c4", "_c5"],
    )
    return skeleton, common


def test_bronze_to_silver_golden(spark):
    skeleton, common = _mk_bronze(spark)
    wide = bronze_to_silver(skeleton, common).orderBy("sample_id")
    rows = {r["sample_id"]: r.asDict() for r in wide.collect()}

    assert set(rows) == {"1", "3"}  # row 2 dropped by invalid filter
    r1 = rows["1"]
    assert r1["user_id"] == 7
    assert r1["user_consumption_2"] == 2     # field 127
    assert r1["user_brands"] == 33           # field 127_14 (quirk)
    assert r1["user_group"] == 5             # common overrides skeleton's 999
    assert r1["item_id"] == 900 and r1["item_category"] == 12
    assert r1["click"] == 1 and r1["conversion"] == 0
    assert r1["position"] is None            # missing field id → null

    r3 = rows["3"]
    assert r3["user_id"] is None             # dangling FK
    assert r3["item_id"] == 902

    assert [c for c in wide.columns if c != "sample_id"] == SILVER_COLUMNS


def test_bronze_to_silver_no_python_udf(spark):
    """The plan must stay JVM-side: no BatchEvalPython/ArrowEvalPython."""
    skeleton, common = _mk_bronze(spark)
    plan = bronze_to_silver(skeleton, common)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_kv_parse_fuzz_vs_python_reference(spark):
    """Property fuzz: the native kv parser must agree with a direct
    Python transliteration of the reference's UDF (split on control
    bytes, stride-3 gather, last-win duplicate keys, drop incomplete
    trailing triplets) on arbitrary byte soup."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from alibaba_cppfeaturestore_spark.functions.kv import parse_kv_triplets

    token = st.text(alphabet="abc019 _", min_size=0, max_size=4)
    sep = st.sampled_from(["\x01", "\x02", "\x03"])
    pieces = st.lists(st.one_of(token, sep), min_size=0, max_size=24)
    cases = st.lists(pieces.map("".join), min_size=1, max_size=8)

    def py_reference(s: str) -> dict:
        toks = re.split("[\x01\x02\x03]", s)
        keys = toks[0::3]
        vals = toks[1::3]
        n = min(len(keys), len(vals))
        out = {}
        for k, v in zip(keys[:n], vals[:n]):
            out[k] = v  # last-win
        return out

    @settings(max_examples=15, deadline=None)
    @given(cases)
    def check(strings):
        df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], ["i", "s"])
        got = {
            r["i"]: (dict(r["m"]) if r["m"] is not None else None)
            for r in df.select("i", parse_kv_triplets("s").alias("m")).collect()
        }
        for i, s in enumerate(strings):
            assert got[i] == py_reference(s), (repr(s), got[i], py_reference(s))

    check()


def test_variant_shred_typed_extraction_and_missing_fields(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"s": "y"}',), ("{}",)], "props string"
    )
    v = F.parse_json(F.col("props"))
    out = df.select(
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.s", "string").alias("s"),
    ).collect()
    assert [(r.k, r.s) for r in out] == [(7, "x"), (None, "y"), (None, None)]


def test_parse_kv_duplicate_field_last_wins_conf_independent(spark):
    """r12 --perturb-kv: a repeated field_id inside ONE feat_list keeps
    the LAST occurrence (the reference builds a dict from the token
    stride, so a later assignment wins) — and it must do so under the
    default mapKeyDedupPolicy=EXCEPTION, not by inheriting LAST_WIN
    from the session."""
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        df = spark.createDataFrame(
            [(kv(("101", "a", "1.0"), ("101", "b", "1.0"), ("101", "c", "1.0")),),
             (kv(("101", "a", "1.0"), ("205", "z", "1.0"), ("101", "b", "1.0")),)],
            ["feat_list"],
        )
        rows = df.select(parse_kv_triplets("feat_list").alias("m")).collect()
        assert rows[0]["m"] == {"101": "c"}
        assert rows[1]["m"] == {"101": "b", "205": "z"}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)


def test_kv_int_strict_integral_gate(spark):
    """The kv-domain int-ingestion policy: strict integral-format only.
    '12.5' / '1e3' / '0x1A' are the raw-cast divergence carriers (DuckDB
    accepts all three, Spark none) — the gate pins NULL on both."""
    from alibaba_cppfeaturestore_spark.functions.kv import kv_int

    vals = ["12", "+3", "-42", "007", "12.5", "1e3", "0x1A", " 7 ",
            "", "abc", "9999999999999999999999", None,
            # trailing newline (r12 advice): Java's '$' matches before a
            # final line terminator, so the old ^..$ gate passed '7\n' in
            # Spark while DuckDB's RE2 rejected it — \A..\z anchors pin
            # end-of-text in both engines
            "7\n", "7\r\n", "\n7"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.i for r in df.select(kv_int(F.col("s")).alias("i")).collect()]
    assert got == [12, 3, -42, 7, None, None, None, None, None, None, None, None,
                   None, None, None]


def test_bronze_to_silver_malformed_values_null_not_crash(spark):
    """A fragment-planted non-integral value flows through the wide
    projection as NULL (reference non-ANSI cast semantics), never an
    ANSI cast error; a planted 'click' field never beats the label."""
    common = spark.createDataFrame(
        [("b1", "2", kv(("101", "7", "1.0"), ("122", "bogus12.5", "1.0")))],
        ["_c0", "_c1", "_c2"],
    )
    skeleton = spark.createDataFrame(
        [("1", "1", "0", "b1", "3",
          kv(("205", "900", "1.0"), ("click", "777", "1.0")))],
        ["_c0", "_c1", "_c2", "_c3", "_c4", "_c5"],
    )
    wide = bronze_to_silver(skeleton, common)
    r = wide.collect()[0].asDict()
    assert r["user_id"] == 7
    assert r["user_group"] is None       # malformed int -> NULL
    assert r["item_id"] == 900
    assert r["click"] == 1               # label injected after merge wins
