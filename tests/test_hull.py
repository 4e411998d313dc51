"""Properties for operators/hull.convex_hull: vertex-set parity with a
brute-force O(n^3) hull-edge definition on random integer point sets,
degenerate contracts (1 point, 2 points, all-collinear, collinear
boundary mid-points, duplicates), the Akl-Toussaint cull's
losslessness, and DuckDB-twin equality."""

import random

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.hull import (_chain, convex_hull,
                                           hull_oracle_sql)


def _brute_vertices(pts):
    """Edge rule mirrored from hull_oracle_sql: all other points
    strictly left, or collinear AND between (inclusive)."""
    pts = sorted(set(pts))
    if len(pts) == 1:
        return set(pts)
    verts = set()
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for c in pts:
                if c in (a, b):
                    continue
                cr = ((b[0] - a[0]) * (c[1] - a[1])
                      - (b[1] - a[1]) * (c[0] - a[0]))
                if cr > 0:
                    continue
                if cr == 0 and (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                                and min(a[1], b[1]) <= c[1]
                                <= max(a[1], b[1])):
                    continue
                ok = False
                break
            if ok:
                verts.add(a)
                verts.add(b)
    return verts


def _rand_pts(n, lim, seed):
    rng = random.Random(seed)
    return [(rng.randrange(lim), rng.randrange(lim)) for _ in range(n)]


@pytest.mark.parametrize("n,lim,seed", [(60, 1000, 1), (200, 40, 2),
                                        (120, 10, 3)])
def test_chain_matches_edge_rule_bruteforce(n, lim, seed):
    pts = sorted(set(_rand_pts(n, lim, seed)))
    assert set(_chain(pts)) == _brute_vertices(pts)


def test_chain_degenerates():
    assert _chain([(5, 5)]) == [(5, 5)]
    assert set(_chain([(1, 1), (9, 9)])) == {(1, 1), (9, 9)}
    # all collinear: only the two extremes
    assert set(_chain(sorted({(i, 2 * i) for i in range(7)}))) \
        == {(0, 0), (6, 12)}
    # collinear boundary mid-point is NOT a vertex
    assert set(_chain(sorted({(0, 0), (2, 0), (4, 0), (2, 3)}))) \
        == {(0, 0), (4, 0), (2, 3)}


def test_convex_hull_matches_bruteforce_per_group(spark):
    rows = []
    for g, (n, lim, seed) in enumerate([(80, 500, 11), (50, 9, 12),
                                        (40, 100000, 13)]):
        rows += [(g, x, y) for x, y in _rand_pts(n, lim, seed)]
    rows += rows[:17]  # duplicates must not matter
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {}
    for r in convex_hull(df, group="g", x_col="x", y_col="y").collect():
        got.setdefault(r.g, set()).add((r.x, r.y))
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        assert got[g] == _brute_vertices(pts), f"group {g}"


def test_convex_hull_single_and_collinear_groups(spark):
    rows = ([(0, 7, 7)]
            + [(1, i, 5) for i in range(6)]
            + [(2, 1, 1), (2, 4, 4)])
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {}
    for r in convex_hull(df, group="g", x_col="x", y_col="y").collect():
        got.setdefault(r.g, set()).add((r.x, r.y))
    assert got == {0: {(7, 7)}, 1: {(0, 5), (5, 5)},
                   2: {(1, 1), (4, 4)}}


def test_cull_is_lossless_on_circle(spark):
    # every point on a circle is a hull vertex — the Akl-Toussaint
    # cull must not discard any of them
    import math
    pts = sorted({(round(10000 * math.cos(2 * math.pi * i / 37)),
                   round(10000 * math.sin(2 * math.pi * i / 37)))
                  for i in range(37)})
    df = spark.createDataFrame([(1, x, y) for x, y in pts],
                               "g long, x long, y long")
    got = {(r.x, r.y) for r in
           convex_hull(df, group="g", x_col="x", y_col="y").collect()}
    assert got == _brute_vertices(pts)
    assert len(got) == 37


def test_hull_oracle_sql_twin_matches(spark):
    import duckdb
    rows = []
    for g in range(3):
        rows += [(g, x, y) for x, y in _rand_pts(70, 200, seed=40 + g)]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {(r.g, r.x, r.y) for r in
           convex_hull(df, group="g", x_col="x", y_col="y").collect()}
    vals = ", ".join(f"({g}, {x}, {y})" for g, x, y in rows)
    sql = hull_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(g, x, y)")
    want = {(int(g), int(x), int(y))
            for g, x, y in duckdb.sql(sql).fetchall()}
    assert got == want


def test_hull_diameter_matches_bruteforce(spark):
    from cdap_geo_spark.operators.hull import hull_diameter
    rows = []
    for g in range(3):
        rows += [(g, x, y) for x, y in _rand_pts(60, 300, seed=70 + g)]
    rows.append((3, 8, 9))  # single-point group: d2 = 0, pair = itself
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r.g: (r.d2, r.ax, r.ay, r.bx, r.by) for r in
           hull_diameter(df, group="g", x_col="x", y_col="y").collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, set()).add((x, y))
    for g, pts in by_g.items():
        best = max(((bx - ax) ** 2 + (by - ay) ** 2, -ax, -ay, -bx, -by)
                   for ax, ay in pts for bx, by in pts
                   if (ax, ay) <= (bx, by))
        want = (best[0], -best[1], -best[2], -best[3], -best[4])
        assert got[g] == want, f"group {g}"
    assert got[3] == (0, 8, 9, 8, 9)


def test_hull_diameter_oracle_twin_matches(spark):
    import duckdb
    from cdap_geo_spark.operators.hull import (hull_diameter,
                                               hull_diameter_oracle_sql)
    rows = [(g, x, y) for g in range(2)
            for x, y in _rand_pts(50, 120, seed=90 + g)]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {tuple(r) for r in
           hull_diameter(df, group="g", x_col="x", y_col="y").collect()}
    vals = ", ".join(f"({g}, {x}, {y})" for g, x, y in rows)
    sql = hull_diameter_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(g, x, y)")
    want = {tuple(int(v) for v in row) for row in duckdb.sql(sql).fetchall()}
    assert got == want
