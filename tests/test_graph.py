"""Properties for operators/graph.pagerank: exact integer-arithmetic
parity with a NumPy reimplementation on random graphs, determinism
under repartitioning (the point of the integer scheme), and basic
sanity (symmetric graph → equal ranks)."""

import random

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations=3, damping_pct=85, scale=10**6):
    nodes = sorted({s for s, _ in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (100 - damping_pct) * scale // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            if b in s:
                s[b] += rank[a] // deg[a]
        rank = {n: base + (damping_pct * s[n]) // 100 for n in nodes}
    return rank


def _random_edges(n_nodes, n_edges, seed):
    rng = random.Random(seed)
    out = set()
    while len(out) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            out.add((a, b))
    return sorted(out)


def test_pagerank_matches_integer_bruteforce(spark):
    edges = _random_edges(60, 400, seed=5)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in
           pagerank(df, iterations=3).collect()}
    want = _numpy_pagerank(edges)
    assert got == want


def test_pagerank_deterministic_under_partitioning(spark):
    # integer arithmetic => identical ranks whatever the partitioning;
    # a float implementation would differ in last-ulp here
    edges = _random_edges(40, 200, seed=9)
    df1 = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    r1 = sorted(map(tuple, pagerank(df1, iterations=4).collect()))
    r2 = sorted(map(tuple, pagerank(df2, iterations=4).collect()))
    assert r1 == r2


def test_pagerank_symmetric_ring(spark):
    # a 6-cycle with both directions: perfectly symmetric, so every
    # node must end with the identical rank
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [((i + 1) % n, i) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = pagerank(df, iterations=3).collect()
    assert len(got) == n
    assert len({r.rank for r in got}) == 1


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def test_pagerank_hub_outranks_leaf(spark):
    # star: every leaf points at the hub and back — hub collects mass
    edges = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, iterations=5).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)
    # leaves are symmetric
    assert len({v for k, v in got.items() if k != 0}) == 1
