"""Property-based tests (hypothesis) for second-wave operators: each
checks an ALGEBRAIC contract against randomized inputs, not a golden
value — the properties the docstrings promise. Example counts are kept
small because every example is a real Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_prop
@given(
    big=st.lists(st.integers(0, 200), min_size=1, max_size=120),
    keys=st.lists(st.integers(0, 200), min_size=0, max_size=30),
)
def test_bloom_semi_join_always_equals_plain(spark, big, keys):
    from alibaba_cppfeaturestore_spark.operators.joins import bloom_semi_join

    bdf = spark.createDataFrame([(i, v) for i, v in enumerate(big)], "rid long, k long")
    kdf = spark.createDataFrame([(v,) for v in keys] or [(None,)], "k long")
    got = {(r.rid, r.k) for r in bloom_semi_join(bdf, kdf, "k", num_bits=1 << 12).collect()}
    want = {(r.rid, r.k) for r in bdf.join(kdf, "k", "left_semi").collect()}
    assert got == want


@_prop
@given(keys=st.sets(st.integers(-10**6, 10**6), min_size=1, max_size=150))
def test_assign_stable_ids_always_equals_global_rank(spark, keys):
    from alibaba_cppfeaturestore_spark.operators.layout import assign_stable_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {(r.k, r.stable_id) for r in assign_stable_ids(df, ["k"], num_partitions=4).collect()}
    want = {(k, i + 1) for i, k in enumerate(sorted(keys))}
    assert got == want


@_prop
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=120
    ),
    n_buckets=st.sampled_from([1, 2, 5, 16]),
)
def test_two_phase_rank_always_equals_window_row_number(spark, vals, n_buckets):
    """Contract: two_phase_rank == row_number() OVER (ORDER BY …) for any
    input — duplicates, NULLs (nulls-first), negative values, any bucket
    count (1 bucket = degenerate single window, still exact)."""
    from alibaba_cppfeaturestore_spark.operators.ranks import two_phase_rank

    df = spark.createDataFrame(list(enumerate(vals)), "rid long, v long")
    w = Window.orderBy(F.asc("v"), F.asc("rid"))
    want = {(r.rid, r.rk) for r in df.select("rid", F.row_number().over(w).cast("bigint").alias("rk")).collect()}
    got = {
        (r.rid, r.rk)
        for r in two_phase_rank(
            df, [F.col("v"), F.col("rid")], rank_col="rk", n_buckets=n_buckets, persist=False
        ).select("rid", "rk").collect()
    }
    assert got == want


@_prop
@given(items=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200))
def test_countmin_estimate_upper_bounds_truth(spark, items):
    from collections import Counter

    from alibaba_cppfeaturestore_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame([(t,) for t in items], "tok string")
    sk = countmin_sketch(df, "tok", depth=3, width=64)
    qs = df.distinct()
    est = {
        r.tok: r.cms_estimate
        for r in countmin_estimate(sk, qs, "tok", depth=3, width=64).collect()
    }
    true = Counter(items)
    assert all(est[t] >= n for t, n in true.items())
    # total mass conservation per depth row: Σ counters = Σ items
    per_depth = {
        r.d: r.s for r in sk.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    }
    assert all(v == len(items) for v in per_depth.values())


@_prop
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=2,
        max_size=60,
    )
)
def test_histogram_percentile_brackets_exact_median(spark, vals):
    from alibaba_cppfeaturestore_spark.operators.sketches import (
        binned_histogram,
        histogram_percentile_estimate,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    width, bins = 2e5 / 16, 32  # cover [0, 2e5) shifted: clamp handles rest
    hist = binned_histogram(df.select((F.col("v") + 1e6).alias("v")), "v", 1e5, 32)
    [row] = histogram_percentile_estimate(hist, [0.5], 1e5).collect()
    svals = sorted(v + 1e6 for v in vals)
    lo, hi = svals[0], svals[-1]
    # estimate falls inside the data range padded by one bin width
    assert lo - 1e5 <= row.est_value <= hi + 1e5


@_prop
@given(text=st.text(alphabet="abc ", min_size=0, max_size=40))
def test_char_shingles_count_and_membership(spark, text):
    from alibaba_cppfeaturestore_spark.functions.text import char_shingles

    df = spark.createDataFrame([(text,)], "t string")
    [row] = df.select(char_shingles(F.col("t"), 5).alias("sh")).collect()
    want = [text[i : i + 5] for i in range(max(len(text) - 4, 0))]
    assert row.sh == want


@_prop
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=80
    )
)
def test_salted_join_property_equals_plain(spark, rows):
    from alibaba_cppfeaturestore_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(rows)], "rid long, k long"
    )
    right = spark.createDataFrame(
        [(k, v) for k, v in {(k, v) for _, (k, v) in zip(range(len(rows)), rows)}],
        "k long, v long",
    )
    got = sorted(
        (r.rid, r.k, r.v) for r in salted_join(left, right, on=["k"], salt=3).collect()
    )
    want = sorted(
        (r.rid, r.k, r.v)
        for r in left.join(right, "k").select("rid", "k", "v").collect()
    )
    assert got == want


@_prop
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 40)),
            st.sampled_from(["aa", "bb", "cc", None]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_exact_dedup_null_id_never_wins(spark, rows):
    """NULL-id policy (driver_sim --perturb-nulls): exact_dedup keeps
    exactly one row per distinct content, and the survivor has the
    smallest NON-NULL id whenever the content group has any identified
    row — a NULL id wins only an all-NULL group."""
    from collections import defaultdict

    from alibaba_cppfeaturestore_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = exact_dedup(df, cols=["text"], id_col="doc_id").collect()

    groups = defaultdict(list)
    for did, text in rows:
        groups[text].append(did)
    assert len(kept) == len(groups)
    survivors = {r.text: r.doc_id for r in kept}
    for text, ids in groups.items():
        real = [i for i in ids if i is not None]
        assert survivors[text] == (min(real) if real else None)


@_prop
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.one_of(st.none(), st.integers(-50, 50))),
        min_size=1,
        max_size=60,
    )
)
def test_mad_outliers_ignores_nulls_like_an_aggregate(spark, vals):
    """NULL-observation policy: mad_outliers over a null-bearing column
    equals mad_outliers over the pre-filtered column — and a group that
    is entirely NULL vanishes."""
    from alibaba_cppfeaturestore_spark.operators.statistics import mad_outliers

    df = spark.createDataFrame(
        [(g, float(v) if v is not None else None) for g, v in vals],
        "g long, v double",
    )
    got = sorted(
        (r.g, r.n, r.median, r.mad, r.n_outliers)
        for r in mad_outliers(df, "v", ["g"]).collect()
    )
    want = sorted(
        (r.g, r.n, r.median, r.mad, r.n_outliers)
        for r in mad_outliers(df.filter(F.col("v").isNotNull()), "v", ["g"]).collect()
    )
    assert got == want
    assert {g for g, *_ in got} == {g for g, v in vals if v is not None}


@_prop
@given(
    series=st.lists(
        st.one_of(st.none(), st.integers(-20, 20)), min_size=1, max_size=40
    )
)
def test_grouped_ewma_skips_and_drops_nulls(spark, series):
    """NULL-tick policy: grouped_ewma over a null-bearing series equals
    grouped_ewma over the observed sub-series (skip-and-drop)."""
    from alibaba_cppfeaturestore_spark.operators.timeseries import grouped_ewma

    rows = [(1, i, float(v) if v is not None else None) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = sorted(
        (r.i, r.ewma) for r in grouped_ewma(df, "k", ["i"], "v").collect()
    )
    observed = df.filter(F.col("v").isNotNull())
    want = sorted(
        (r.i, r.ewma) for r in grouped_ewma(observed, "k", ["i"], "v").collect()
    )
    assert got == want
    assert len(got) == sum(v is not None for v in series)


@_prop
@given(
    feats=st.lists(
        st.tuples(
            st.integers(1, 3),            # key
            st.integers(0, 6),            # feature ts (coarse -> frequent ties)
            st.integers(-5, 5),           # value
        ),
        min_size=0,
        max_size=25,
    ),
    events=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 6)),
        min_size=1,
        max_size=10,
    ),
)
def test_asof_join_always_matches_reference_under_ties(spark, feats, events):
    """asof_join's full contract against a pure-Python reference:
    latest feature at-or-before the event; ties at the winning timestamp
    resolve to the LARGEST feature struct (value desc) — the order the
    catalog oracles replay. Coarse integer timestamps make ties the
    common case, the regime the stacked skew+ts fuzz first exposed."""
    from alibaba_cppfeaturestore_spark.operators.joins import asof_join

    ts0 = 1_700_000_000
    fdf = spark.createDataFrame(
        [(k, t + ts0, float(v)) for k, t, v in feats] or [(None, None, None)],
        "k long, ft long, v double",
    ).select("k", F.timestamp_seconds("ft").alias("ft"), "v")
    edf = spark.createDataFrame(
        [(i, k, t + ts0) for i, (k, t) in enumerate(events)],
        "rid long, k long, et long",
    ).select("rid", "k", F.timestamp_seconds("et").alias("et"))

    got = {
        r.rid: r.v
        for r in asof_join(
            edf, fdf, keys=["k"], event_ts="et", feature_ts="ft", features=["v"]
        ).collect()
    }

    def ref(k, t):
        cands = [(ft, v) for fk, ft, v in feats if fk == k and ft <= t]
        if not cands:
            return None
        best_ts = max(ft for ft, _ in cands)
        return float(max(v for ft, v in cands if ft == best_ts))

    want = {i: ref(k, t) for i, (k, t) in enumerate(events)}
    assert got == want


@_prop
@given(
    tokens=st.lists(
        st.one_of(
            st.sampled_from(["\x01", "\x02", "\x03"]),
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\x01\x02\x03",
                    blacklist_categories=("Cs",),
                ),
                max_size=6,
            ),
        ),
        min_size=0,
        max_size=24,
    )
)
def test_parse_kv_triplets_always_equals_python_reference(spark, tokens):
    """The parser's FULL contract vs an independent Python replay of the
    reference's stride framing (batch_process_Bronze_to_Silver.py:69-73):
    split on the three control bytes, keys at stride 0, values at
    stride 1, truncate to complete pairs, LAST assignment to a repeated
    field_id wins (dict-build). Randomized byte soup drives ragged
    frames, duplicate keys, empty tokens, and separator runs — the
    whole --perturb-kv malformation space — through both paths."""
    import re as _re

    from alibaba_cppfeaturestore_spark.functions.kv import parse_kv_triplets

    s = "".join(tokens)

    def reference(feat_list):
        toks = _re.split("[\x01\x02\x03]", feat_list)
        keys, vals = toks[0::3], toks[1::3]
        n = min(len(keys), len(vals))
        out = {}
        for k, v in zip(keys[:n], vals[:n]):
            out[k] = v  # later assignment wins
        return out

    df = spark.createDataFrame([(s,)], "feat_list string")
    got = df.select(parse_kv_triplets("feat_list").alias("m")).first()["m"]
    assert dict(got) == reference(s)
