"""Connected components (operators.components) vs a union-find
reference on random graphs, plus structure edge cases: chains
(transitivity beyond pairwise policies), singletons, isolated
vertices, empty edge sets, and convergence on a long path."""

import random

import pytest

from embulk_filter_timestamp_format_spark.operators.components import (
    connected_components,
)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.limit(0)
    nd = (
        spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        if nodes is not None
        else None
    )
    got = connected_components(e, nodes=nd).collect()
    return {r["node"]: r["component"] for r in got}


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(13)
    nodes = list(range(120))
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    expect = _uf_components(edges, nodes)
    got = _run(spark, edges, nodes=nodes)
    assert got == expect


def test_components_chain_is_transitive(spark):
    # a-b, b-c: pairwise keep-min policies see two pairs; the component
    # is one group rooted at the smallest id
    got = _run(spark, [(5, 9), (9, 2)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_components_isolated_vertices_are_singletons(spark):
    got = _run(spark, [(1, 2)], nodes=[1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_components_empty_edges(spark):
    got = _run(spark, [], nodes=[7, 8])
    assert got == {7: 7, 8: 8}


def test_components_long_path_converges(spark):
    n = 30
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges)
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_max_iter_raises(spark):
    edges = [(i, i + 1) for i in range(20)]
    with pytest.raises(RuntimeError):
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        connected_components(e, max_iter=2)
