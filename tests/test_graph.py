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


def _brute_triangles(und_edges):
    """und_edges: set of canonical (u, v) u < v tuples."""
    adj = {}
    for u, v in und_edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {n: 0 for n in adj}
    es = sorted(und_edges)
    for u, v in es:
        for w in adj[u] & adj[v]:
            if w > v:  # each triangle once as u < v < w
                for x in (u, v, w):
                    counts[x] += 1
    return counts


def test_triangle_counts_matches_bruteforce(spark):
    from cdap_geo_spark.operators.graph import triangle_counts
    raw = _random_edges(40, 220, seed=17)  # directed, both orders mixed
    und = {(min(a, b), max(a, b)) for a, b in raw}
    got = {r.id: r.triangles for r in
           triangle_counts(spark.createDataFrame(raw, "src int, dst int"))
           .collect()}
    assert got == _brute_triangles(und)
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_triangle_counts_canonicalizes_input(spark):
    from cdap_geo_spark.operators.graph import triangle_counts
    # triangle 1-2-3 given redundantly (both orders, dup, self-loop)
    # plus a pendant node 4 that closes nothing
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (3, 3), (3, 4)]
    got = {r.id: r.triangles for r in
           triangle_counts(spark.createDataFrame(edges, "src int, dst int"))
           .collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_triangle_counts_no_nested_loop(spark):
    from cdap_geo_spark.operators.graph import triangle_counts
    edges = spark.createDataFrame(_random_edges(30, 100, seed=3),
                                  "src int, dst int")
    plan = triangle_counts(edges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_triangle_oracle_sql_twin_matches(spark):
    import duckdb
    from cdap_geo_spark.operators.graph import (triangle_counts,
                                                triangle_oracle_sql)
    raw = _random_edges(35, 180, seed=29)
    und = sorted({(min(a, b), max(a, b)) for a, b in raw})
    got = {r.id: r.triangles for r in
           triangle_counts(spark.createDataFrame(raw, "src int, dst int"))
           .collect()}
    vals = ", ".join(f"({u}, {v})" for u, v in und)
    sql = triangle_oracle_sql(f"SELECT * FROM (VALUES {vals}) AS t(u, v)")
    want = {int(i): int(c) for i, c in duckdb.sql(sql).fetchall()}
    assert got == want
