"""Connected components (engine/cluster.py) vs an exact union-find oracle.

The loop's two scaling claims are asserted directly: correctness (min id per
component, any topology) and round count (pointer jumping contracts a path
graph in O(log n) rounds where plain hash-min needs O(n))."""

from __future__ import annotations

import numpy as np

from rust_s2_spark.engine.cluster import connected_components


def _union_find(n_edges):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set()
    for a, b in n_edges:
        nodes.add(a)
        nodes.add(b)
    return {x: find(x) for x in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    got = connected_components(df, **kw)
    return {r.node: r.cluster for r in got.collect()}


def test_two_components_and_isolated_edge(spark):
    edges = [(1, 2), (2, 3), (10, 11), (3, 1)]
    assert _run(spark, edges) == _union_find(edges)


def test_path_graph_logarithmic_rounds(spark):
    """A 120-node path: plain hash-min needs ~120 rounds; hash-min with
    pointer jumping must finish in well under 20."""
    edges = [(i, i + 1) for i in range(1, 120)]
    stats = {}
    got = _run(spark, edges, stats=stats)
    assert got == _union_find(edges)
    assert set(got.values()) == {1}
    assert stats["rounds"] <= 20, stats


def test_random_graphs_match_union_find(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 150
        m = int(rng.randint(40, 200))
        edges = set()
        while len(edges) < m:
            a, b = rng.randint(1, n + 1, 2)
            if a != b:
                edges.add((int(min(a, b)), int(max(a, b))))
        edges = sorted(edges)
        assert _run(spark, edges) == _union_find(edges)


def test_label_ids_shuffled_are_component_minima(spark):
    """Labels must be the MIN id even when the min enters through a long
    chain (descending ids stress the monotone-convergence argument)."""
    edges = [(i + 1, i) for i in range(1, 60)]  # 60 -> ... -> 1 descending
    got = _run(spark, edges)
    assert set(got.values()) == {1}


def test_query_matches_union_find_on_real_pairs(spark):
    """q_spatial_cluster vs union-find over q_distance_join's own pairs at
    sf0.001 — pins query wiring (memoization, sizes join) to the kernel."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r.event_a, r.event_b)
        for r in QUERIES["s2_distance_join"](spark, sf).collect()
    ]
    expect = _union_find(pairs)
    out = {
        r.event_id: (r.cluster_id, r.cluster_size)
        for r in QUERIES["s2_spatial_cluster"](spark, sf).collect()
    }
    from collections import Counter

    sizes = Counter(expect.values())
    assert {k: v[0] for k, v in out.items()} == expect
    assert all(v[1] == sizes[v[0]] for v in out.values())
    assert len(out) > 20
    clear_geo_cache()
