"""Connected-components / duplicate-cluster semantics.

Pins transitivity (chains merge into one cluster even when the endpoints
never pair directly), singleton handling, convergence on multi-hop paths,
and the non-numeric-id fallback path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
    duplicate_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }


def test_chain_merges_transitively(spark):
    # 1-2-3-4-5 is a 4-hop chain: endpoints never share an edge, yet all
    # five land in component 1 (requires ≥4 propagation rounds).
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_components_stay_separate(spark):
    comp = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert comp == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_edge_direction_and_self_loops_irrelevant(spark):
    comp = _cc(spark, [(5, 3), (3, 3), (4, 5)])
    assert comp == {3: 3, 4: 3, 5: 3}


def test_string_ids_use_join_fallback(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
    )
    comp = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=1)


def test_duplicate_clusters_attaches_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(2, 4), (4, 6)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}


def test_keep_canonical_is_transitive_unlike_pair_losers(spark):
    # Chain 2-4-6: pair-loser dedup on pairs {(2,4),(4,6)} already drops
    # 4 and 6, but with pairs {(4,6),(2,4)} given as (6,4),(4,2) orderings
    # a one-hop rule could keep the wrong rows; CC keeps exactly min=2.
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [2, 4, 6, 9]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(4, 6), (2, 4)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    assert kept == [2, 9]
    # schema untouched apart from the filter
    assert dedup_keep_canonical(docs, pairs).columns == ["doc_id", "text"]


def test_cluster_ids_match_real_corpus_near_dups(spark):
    from alibaba_cppfeaturestore_spark.operators.dedup import ngram_jaccard_pairs
    from alibaba_cppfeaturestore_spark.plans.views import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(
        docs, text_col="text", id_col="doc_id", block_cols=["lang"], threshold=0.9
    )
    out = duplicate_clusters(docs, pairs)
    assert out.count() == docs.count()
    # the corpus's known near-dup pair lands in one shared cluster whose
    # id is a real doc id no larger than either member
    c = {r["doc_id"]: r["cluster_id"] for r in out.filter(
        F.col("doc_id").isin(8, 12)).collect()}
    assert c[8] == c[12] and c[8] <= 8


def test_cc_matches_union_find_on_random_graph(spark):
    """5000-node random graph vs a driver-side union-find reference —
    catches propagation bugs that tiny hand-built graphs can't."""
    import random

    rng = random.Random(42)
    n_nodes, n_edges = 5000, 6000
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id per component
    comp_min = {}
    for x in range(n_nodes):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    touched = {x for a, b in edges if a != b for x in (a, b)}
    expected = {x: comp_min[find(x)] for x in touched}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iterations=50).collect()
    }
    assert got == expected


def test_triangle_count_known_graph(spark):
    from alibaba_cppfeaturestore_spark.operators.graph import triangle_count

    # K4 has 4 triangles; plus a pendant edge (no new triangle)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    [row] = triangle_count(df).collect()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_triangle_count_handles_duplicates_reversals_loops(spark):
    from alibaba_cppfeaturestore_spark.operators.graph import triangle_count

    # triangle listed twice, once reversed, plus a self-loop: still 1
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    [row] = triangle_count(df).collect()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


def test_triangle_count_star_has_no_triangles(spark):
    from alibaba_cppfeaturestore_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(0, i) for i in range(1, 20)], "src long, dst long")
    [row] = triangle_count(df).collect()
    assert row.n_triangles == 0 and row.n_edges == 19
