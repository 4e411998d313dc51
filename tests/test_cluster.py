"""Properties for operators/cluster.grid_cluster: brute-force parity
(dense-cell histogram + BFS components in python) on random point
clouds, noise exclusion, diagonal adjacency, isolated dense cell,
validation, and the DuckDB recursive-CTE twin."""

import random

import pytest

from cdap_geo_spark.operators.cluster import (_M, grid_cluster,
                                              grid_cluster_oracle_sql)


def _brute(points, cell, min_pts):
    from collections import deque
    hist = {}
    for x, y in points:
        c = (int(x) // cell, int(y) // cell)
        hist[c] = hist.get(c, 0) + 1
    dense = {c: n for c, n in hist.items() if n >= min_pts}
    out = {}
    seen = set()
    for c in dense:
        if c in seen:
            continue
        comp = []
        q = deque([c])
        seen.add(c)
        while q:
            cur = q.popleft()
            comp.append(cur)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in dense and nb not in seen:
                        seen.add(nb)
                        q.append(nb)
        label = min(cx * _M + cy for cx, cy in comp)
        for cx, cy in comp:
            out[(cx, cy)] = (dense[(cx, cy)], label)
    return out


def test_grid_cluster_matches_bruteforce(spark):
    rng = random.Random(4)
    # three blobs + uniform noise
    pts = []
    for bx, by in [(100, 100), (500, 480), (520, 500)]:
        pts += [(bx + rng.randrange(60), by + rng.randrange(60))
                for _ in range(60)]
    pts += [(rng.randrange(1000), rng.randrange(1000))
            for _ in range(80)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.cx, r.cy): (r.n_pts, r.cluster) for r in
           grid_cluster(df, cell_size=40, min_pts=4).collect()}
    assert got == _brute(pts, 40, 4)
    assert len(got) > 2
    # the two overlapping blobs share one cluster label
    labels = {v[1] for v in got.values()}
    assert len(labels) >= 2


def test_grid_cluster_diagonal_and_isolated(spark):
    # two dense cells touching only diagonally -> one cluster;
    # a third far away -> its own singleton cluster
    pts = ([(5, 5)] * 3 + [(15, 15)] * 3 + [(905, 905)] * 3)
    df = spark.createDataFrame([(x, y) for x, y in pts], "x long, y long")
    got = {(r.cx, r.cy): r.cluster for r in
           grid_cluster(df, cell_size=10, min_pts=3).collect()}
    assert got[(0, 0)] == got[(1, 1)] == 0 * _M + 0
    assert got[(90, 90)] == 90 * _M + 90
    with pytest.raises(ValueError):
        grid_cluster(df, cell_size=0)
    with pytest.raises(ValueError):
        grid_cluster(df, cell_size=10, min_pts=0)


def test_grid_cluster_oracle_twin_matches(spark):
    import duckdb
    rng = random.Random(11)
    pts = [(rng.randrange(300), rng.randrange(300)) for _ in range(400)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {tuple(r) for r in
           grid_cluster(df, cell_size=30, min_pts=3).collect()}
    pv = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = grid_cluster_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) AS t(x, y)",
        cell_size=30, min_pts=3)
    want = {tuple(int(v) for v in row)
            for row in duckdb.sql(sql).fetchall()}
    assert got == want


def _brute_heat(pts, cs, r):
    from collections import Counter
    hist = Counter((x // cs, y // cs) for x, y in pts)
    heat = Counter()
    for (cx, cy), n in hist.items():
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                heat[(cx + dx, cy + dy)] += \
                    n * (r + 1 - abs(dx)) * (r + 1 - abs(dy))
    return {k: v for k, v in heat.items() if v}


def test_grid_heatmap_matches_bruteforce(spark):
    import random
    from cdap_geo_spark.operators.cluster import grid_heatmap
    rng = random.Random(31)
    pts = [(rng.randrange(0, 1000), rng.randrange(0, 1000))
           for _ in range(400)]
    df = spark.createDataFrame(pts, "x long, y long")
    for r in (0, 1, 2):
        got = {(row.cx, row.cy): row.heat for row in
               grid_heatmap(df, cell_size=100, radius=r).collect()}
        assert got == _brute_heat(pts, 100, r), f"radius={r}"


def test_grid_heatmap_radius0_is_histogram(spark):
    from cdap_geo_spark.operators.cluster import grid_heatmap
    df = spark.createDataFrame([(5, 5), (7, 7), (205, 5)],
                               "x long, y long")
    got = {(r.cx, r.cy): r.heat for r in
           grid_heatmap(df, cell_size=100, radius=0).collect()}
    assert got == {(0, 0): 2, (2, 0): 1}


def test_grid_heatmap_oracle_twin_and_validation(spark):
    import duckdb
    import pytest as _pt
    from cdap_geo_spark.operators.cluster import (grid_heatmap,
                                                  grid_heatmap_oracle_sql)
    pts = [(i * 37 % 500, i * 91 % 500) for i in range(120)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.cx, r.cy): r.heat for r in
           grid_heatmap(df, cell_size=50, radius=1).collect()}
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = grid_heatmap_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(x, y)",
        cell_size=50, radius=1)
    want = {(int(a), int(b)): int(h)
            for a, b, h in duckdb.sql(sql).fetchall()}
    assert got == want
    with _pt.raises(ValueError):
        grid_heatmap(df, cell_size=0)
    with _pt.raises(ValueError):
        grid_heatmap(df, cell_size=10, radius=-1)


# ---------------------------------------------------------------------------
# hex_bin
# ---------------------------------------------------------------------------


def _brute_hex(pts, size):
    import math
    out = {}
    for x, y in pts:
        fq = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
        fr = (2.0 / 3.0 * y) / size
        fy = -fq - fr
        # python round is banker's; the operator defines HALF-UP
        import decimal
        rnd = lambda v: float(decimal.Decimal(v).quantize(  # noqa: E731
            0, rounding=decimal.ROUND_HALF_UP))
        rq, rr, ry = rnd(fq), rnd(fr), rnd(fy)
        dq, dr, dy = abs(rq - fq), abs(rr - fr), abs(ry - fy)
        if dq > dy and dq > dr:
            q, r = -ry - rr, rr
        elif dr > dy:
            q, r = rq, -rq - ry
        else:
            q, r = rq, rr
        k = (int(q), int(r))
        out[k] = out.get(k, 0) + 1
    return out


def test_hex_bin_matches_bruteforce(spark):
    import numpy as np
    from cdap_geo_spark.operators.cluster import hex_bin
    rng = np.random.default_rng(13)
    pts = [(int(rng.integers(0, 2000)), int(rng.integers(0, 2000)))
           for _ in range(400)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.hq, r.hr): r.n for r in hex_bin(df, size=90.0).collect()}
    assert got == _brute_hex(pts, 90.0)
    assert sum(got.values()) == 400  # every point lands in one hex
    with pytest.raises(ValueError):
        hex_bin(df, size=0)


def test_hex_bin_center_and_neighbors(spark):
    # the origin hexagon contains (0,0); one hex-width right
    # (sqrt(3)*size) is the center of axial (1, 0); the center of
    # (0, 1) sits at (sqrt(3)/2*size, 1.5*size)
    import math
    from cdap_geo_spark.operators.cluster import hex_bin
    s = 100.0
    df = spark.createDataFrame(
        [(0.0, 0.0), (math.sqrt(3.0) * s, 0.0),
         (math.sqrt(3.0) / 2.0 * s, 1.5 * s)],
        "x double, y double")
    got = {(r.hq, r.hr): r.n for r in hex_bin(df, size=s).collect()}
    assert got == {(0, 0): 1, (1, 0): 1, (0, 1): 1}


def test_hex_bin_oracle_twin_matches(spark):
    import duckdb
    import numpy as np
    from cdap_geo_spark.operators.cluster import (hex_bin,
                                                  hex_bin_oracle_sql)
    rng = np.random.default_rng(29)
    pts = [(int(rng.integers(0, 5000)), int(rng.integers(0, 5000)))
           for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.hq, r.hr): r.n for r in hex_bin(df, size=130.0).collect()}
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = hex_bin_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(x, y)", size=130.0)
    want = {(int(q), int(r)): int(n)
            for q, r, n in duckdb.sql(sql).fetchall()}
    assert got == want


def test_hex_smooth_brute_force(spark):
    import random
    from cdap_geo_spark.operators.cluster import HEX_RING1, hex_smooth
    random.seed(73)
    hexes = {}
    for _ in range(50):
        hexes[(random.randrange(-5, 6), random.randrange(-5, 6))] = \
            random.randrange(1, 20)
    df = spark.createDataFrame([(q, r, n) for (q, r), n in hexes.items()],
                               "hq long, hr long, n long")
    got = {(r.hq, r.hr): (r.sum_n, r.smooth_u)
           for r in hex_smooth(df).collect()}
    want = {}
    for (q, r), n in hexes.items():
        for dq, dr in HEX_RING1:
            k = (q + dq, r + dr)
            want[k] = want.get(k, 0) + n
    want = {k: (s, round(1e6 * s / 7.0)) for k, s in want.items()}
    assert got == want
    # an isolated hex smooths to n/7 at its own position and spreads
    # the same value to all six neighbors
    (iso,) = [( (9, 9), 14)]
    dfi = spark.createDataFrame([(9, 9, 14)], "hq long, hr long, n long")
    giso = {(r.hq, r.hr): r.smooth_u for r in hex_smooth(dfi).collect()}
    assert len(giso) == 7 and set(giso.values()) == {2_000_000}


def test_dbscan_brute_force(spark):
    import random
    from cdap_geo_spark.operators.cluster import dbscan
    random.seed(71)
    # two tight blobs + scatter so all three kinds appear
    pts = ([(i, 50 + random.randrange(20), 50 + random.randrange(20))
            for i in range(15)]
           + [(100 + i, 500 + random.randrange(25),
               500 + random.randrange(25)) for i in range(12)]
           + [(200 + i, random.randrange(1000), random.randrange(1000))
              for i in range(25)]
           # fringe point: within eps of the first blob's edge but too
           # sparse a neighborhood to be core itself -> border
           + [(300, 21, 61)])
    eps, min_pts = 30, 4
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r.id: (r.cluster, r.kind) for r in
           dbscan(df, eps=eps, min_pts=min_pts).collect()}

    ids = [p[0] for p in pts]
    xy = {p[0]: (p[1], p[2]) for p in pts}
    nbr = {i: [j for j in ids if j != i
               and (xy[i][0] - xy[j][0]) ** 2
               + (xy[i][1] - xy[j][1]) ** 2 <= eps * eps]
           for i in ids}
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    # components of the core-core eps-graph, label = min member
    comp = {}
    for c in sorted(core):
        if c in comp:
            continue
        stack, seen = [c], {c}
        while stack:
            u = stack.pop()
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        lab = min(seen)
        for u in seen:
            comp[u] = lab
    want = {}
    for i in ids:
        if i in core:
            want[i] = (comp[i], "core")
        else:
            cores_near = [comp[j] for j in nbr[i] if j in core]
            want[i] = ((min(cores_near), "border") if cores_near
                       else (None, "noise"))
    assert got == want
    assert any(k == "core" for _, k in got.values())
    assert any(k == "border" for _, k in got.values())
    assert any(k == "noise" for _, k in got.values())


def test_dbscan_validation(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.cluster import dbscan
    df = spark.createDataFrame([(1, 2, 3)], "id long, x long, y long")
    with _pt.raises(ValueError):
        dbscan(df, eps=0, min_pts=1)
    with _pt.raises(ValueError):
        dbscan(df, eps=5, min_pts=0)


def test_percolation_profile_monotone(spark):
    """The percolation query's structural invariants on the sf0.001
    fixture: dense cells and largest component shrink (weakly) as the
    density threshold rises; counts are consistent."""
    import __spark_entry__ as E
    rows = {r.min_pts: (r.n_dense, r.n_clusters, r.largest_cells,
                        r.largest_pts)
            for r in E._q_percolation(
                spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {2, 4, 8}
    for t in (2, 4, 8):
        nd, nc, lc, lp = rows[t]
        assert nc <= nd and lc <= nd
        assert (nd == 0) == (nc == 0)
        if nc:
            assert lp >= lc * t  # every cell in a component >= t pts
    assert rows[2][0] >= rows[4][0] >= rows[8][0]
    assert rows[2][2] >= rows[4][2] >= rows[8][2]
