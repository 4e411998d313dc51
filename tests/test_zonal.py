"""Zonal-statistics tests vs brute-force containment in NumPy."""

import numpy as np
from pyspark.sql import functions as F

from cdap_geo_spark import udfs


def _frames(spark, n_pts=300, n_zones=20, seed=3):
    rng = np.random.RandomState(seed)
    px = rng.uniform(0, 1000, n_pts)
    py = rng.uniform(0, 1000, n_pts)
    val = rng.randint(1, 50, n_pts)
    zx = rng.uniform(0, 900, n_zones)
    zy = rng.uniform(0, 900, n_zones)
    zw = rng.uniform(50, 300, n_zones)
    zh = rng.uniform(50, 300, n_zones)
    pts = spark.createDataFrame(
        [(int(i), float(px[i]), float(py[i]), int(val[i]))
         for i in range(n_pts)],
        "doc_id long, x double, y double, v long").select(
        "doc_id", "v",
        udfs.st_point()(F.col("x"), F.col("y")).alias("geometry"))
    zones = spark.createDataFrame(
        [(int(j), float(zx[j]), float(zy[j]),
          float(zx[j] + zw[j]), float(zy[j] + zh[j]))
         for j in range(n_zones)],
        "region_id long, minx double, miny double, maxx double, maxy double"
    ).select("region_id",
             udfs.st_box()(F.col("minx"), F.col("miny"),
                           F.col("maxx"), F.col("maxy")).alias("geometry"))
    return pts, zones, (px, py, val), (zx, zy, zw, zh)


def test_zonal_stats_matches_bruteforce(spark):
    from cdap_geo_spark.operators.zonal import zonal_stats
    pts, zones, (px, py, val), (zx, zy, zw, zh) = _frames(spark)
    got = zonal_stats(pts, zones, value_col="v", level=4).toPandas() \
        .set_index("region_id").sort_index()
    assert len(got) == 20          # include_empty keeps every zone
    for j in range(20):
        inside = ((px >= zx[j]) & (px <= zx[j] + zw[j])
                  & (py >= zy[j]) & (py <= zy[j] + zh[j]))
        assert got.loc[j, "n_rows"] == int(inside.sum())
        assert got.loc[j, "sum_value"] == int(val[inside].sum())
        assert got.loc[j, "max_value"] == (int(val[inside].max())
                                           if inside.any() else 0)


def test_zonal_stats_drop_empty_and_float_values(spark):
    from cdap_geo_spark.operators.zonal import zonal_stats
    pts, zones, (px, py, val), (zx, zy, zw, zh) = _frames(spark)
    ptsf = pts.withColumn("v", F.col("v") * 0.5)
    got = zonal_stats(ptsf, zones, value_col="v", level=4,
                      include_empty=False).toPandas()
    occupied = {j for j in range(20)
                if (((px >= zx[j]) & (px <= zx[j] + zw[j])
                     & (py >= zy[j]) & (py <= zy[j] + zh[j])).any())}
    assert set(got.region_id) == occupied
    assert dict(zonal_stats(ptsf, zones, value_col="v", level=4)
                .dtypes)["sum_value"] == "double"
    for _, r in got.iterrows():
        j = int(r.region_id)
        inside = ((px >= zx[j]) & (px <= zx[j] + zw[j])
                  & (py >= zy[j]) & (py <= zy[j] + zh[j]))
        assert abs(r.sum_value - val[inside].sum() * 0.5) < 1e-9


def test_areal_interpolate_matches_bruteforce(spark):
    import random

    from cdap_geo_spark import udfs
    from cdap_geo_spark.operators.zonal import areal_interpolate
    from pyspark.sql import functions as F

    rng = random.Random(3)

    def boxes(n, base):
        out = []
        for i in range(n):
            x, y = rng.randrange(1000), rng.randrange(1000)
            out.append((base + i, x, y, x + rng.randrange(50, 300),
                        y + rng.randrange(50, 300),
                        rng.randrange(1, 500)))
        return out

    srcs = boxes(40, 0)
    tgts = boxes(8, 1000)
    sdf = spark.createDataFrame(
        [(i, v) for i, x0, y0, x1, y1, v in srcs], "sid long, val long"
    ).join(spark.createDataFrame(
        srcs, "sid long, x0 long, y0 long, x1 long, y1 long, v long")
        .select("sid", udfs.st_box()(
            F.col("x0").cast("double"), F.col("y0").cast("double"),
            F.col("x1").cast("double"), F.col("y1").cast("double"))
            .alias("geometry")), "sid")
    tdf = spark.createDataFrame(
        tgts, "tid long, x0 long, y0 long, x1 long, y1 long, v long") \
        .select("tid", udfs.st_box()(
            F.col("x0").cast("double"), F.col("y0").cast("double"),
            F.col("x1").cast("double"), F.col("y1").cast("double"))
            .alias("geometry"))
    got = {r.tid: (r.est_scaled, r.n_src) for r in areal_interpolate(
        sdf, tdf, value_col="val", left_id="sid", right_id="tid",
        level=6).collect()}

    want = {}
    for tid, tx0, ty0, tx1, ty1, _ in tgts:
        tot, n = 0, 0
        for sid, sx0, sy0, sx1, sy1, v in srcs:
            if sx0 > tx1 or sy0 > ty1 or sx1 < tx0 or sy1 < ty0:
                continue
            ia = (max(0, min(sx1, tx1) - max(sx0, tx0))
                  * max(0, min(sy1, ty1) - max(sy0, ty0)))
            sa = (sx1 - sx0) * (sy1 - sy0)
            tot += int((v * ia) / sa * 1e6 + 0.5)
            n += 1
        if n:
            want[tid] = (tot, n)
    assert got == want
    # mass check: a target covering everything gets ~ the total value


def test_morans_i_matches_bruteforce_and_sign(spark):
    import random

    from cdap_geo_spark.operators.zonal import morans_i

    rng = random.Random(8)
    # a ring of 30 nodes; smooth values -> positive autocorrelation
    n = 30
    xs = [100 + 10 * (i % 15) for i in range(n)]  # smooth-ish along ring
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [((i + 1) % n, i) for i in range(n)]
    out = morans_i(
        spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                              "id long, x long"),
        spark.createDataFrame(edges, "a long, b long"),
        id_col="id", value_col="x").collect()[0]

    s = sum(xs)
    mean = s // n
    z = [x - mean for x in xs]
    num = sum(z[a] * z[b] for a, b in edges)
    den = sum(v * v for v in z)
    assert (out.n, out.w_pairs, out.num, out.den) == \
        (n, len(edges), num, den)
    import math
    want = math.floor(n * num / (len(edges) * den) * 1e6 + 0.5)
    assert out.i_micro == want
    assert out.i_micro > 0  # smooth ring: positive autocorrelation

    # alternating values -> strongly negative autocorrelation
    xs2 = [0 if i % 2 == 0 else 1000 for i in range(n)]
    out2 = morans_i(
        spark.createDataFrame([(i, x) for i, x in enumerate(xs2)],
                              "id long, x long"),
        spark.createDataFrame(edges, "a long, b long"),
        id_col="id", value_col="x").collect()[0]
    assert out2.i_micro < -900000  # ~ -1
    del rng


def test_gearys_c_matches_bruteforce_and_sign(spark):
    from cdap_geo_spark.operators.zonal import gearys_c

    n = 30
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [((i + 1) % n, i) for i in range(n)]
    ed = spark.createDataFrame(edges, "a long, b long")

    def run(xs):
        return gearys_c(
            spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                                  "id long, x long"),
            ed, id_col="id", value_col="x").collect()[0]

    xs = [100 + 10 * (i % 15) for i in range(n)]
    out = run(xs)
    s = sum(xs)
    mean = s // n
    z = [x - mean for x in xs]
    num = sum((xs[a] - xs[b]) ** 2 for a, b in edges)
    den = sum(v * v for v in z)
    assert (out.n, out.w_pairs, out.num, out.den) == \
        (n, len(edges), num, den)
    import math
    want = math.floor((n - 1) * num / (2 * len(edges) * den) * 1e6 + 0.5)
    assert out.c_micro == want
    assert out.c_micro < 1_000_000  # smooth ring: C < 1

    out2 = run([0 if i % 2 == 0 else 1000 for i in range(n)])
    assert out2.c_micro > 1_500_000  # alternating: C ~ 2


def test_cell_coverage_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.zonal import cell_coverage

    rng = random.Random(29)
    rows = []
    for i in range(60):
        x0, y0 = rng.randrange(0, 900), rng.randrange(0, 900)
        rows.append((x0, y0, x0 + rng.randrange(1, 350),
                     y0 + rng.randrange(1, 350)))
    df = spark.createDataFrame(
        rows, "minx long, miny long, maxx long, maxy long")
    C = 100
    got = {(r.cx, r.cy): (r.n_boxes, r.covered) for r in
           cell_coverage(df, cell=C).collect()}
    want = {}
    for x0, y0, x1, y1 in rows:
        for cx in range(x0 // C, x1 // C + 1):
            for cy in range(y0 // C, y1 // C + 1):
                w = min(x1, (cx + 1) * C) - max(x0, cx * C)
                h = min(y1, (cy + 1) * C) - max(y0, cy * C)
                if w > 0 and h > 0:
                    n, a = want.get((cx, cy), (0, 0))
                    want[(cx, cy)] = (n + 1, a + w * h)
    assert got == want
    # conservation: total clipped area == total box area
    assert sum(a for _, a in got.values()) == \
        sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in rows)


def test_cell_coverage_boundary_and_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.zonal import cell_coverage

    # box exactly on cell boundaries: no zero-width ghost cells
    df = spark.createDataFrame([(100, 100, 200, 300)],
                               "minx long, miny long, maxx long, maxy long")
    got = {(r.cx, r.cy): (r.n_boxes, r.covered) for r in
           cell_coverage(df, cell=100).collect()}
    assert got == {(1, 1): (1, 10000), (1, 2): (1, 10000)}
    with _pt.raises(ValueError):
        cell_coverage(df, cell=0)


def test_marching_squares_brute_force(spark):
    import random
    from cdap_geo_spark.operators.zonal import marching_squares
    random.seed(29)
    cells = {}
    for _ in range(120):
        cells[(random.randrange(12), random.randrange(12))] = \
            random.randrange(0, 8)
    rows = [(x, y, v) for (x, y), v in cells.items() if v > 0]
    df = spark.createDataFrame(rows, "cx long, cy long, v long")
    iso = 3
    got = {(r.bx, r.by): (r.case_id, r.n_segs)
           for r in marching_squares(df, iso=iso).collect()}
    # brute force over blocks adjacent to any present cell
    blocks = set()
    for (x, y), v in cells.items():
        if v > 0:
            for ix in (0, 1):
                for iy in (0, 1):
                    blocks.add((x - ix, y - iy))
    want = {}
    for bx, by in blocks:
        v = [cells.get((bx, by), 0), cells.get((bx + 1, by), 0),
             cells.get((bx + 1, by + 1), 0), cells.get((bx, by + 1), 0)]
        case = sum((1 << i) for i in range(4) if v[i] >= iso)
        if case not in (0, 15):
            want[(bx, by)] = (case, 2 if case in (5, 10) else 1)
    assert got == want
    assert any(c in (5, 10) for c, _ in got.values()) or len(got) > 0


def test_marching_squares_known_plateau(spark):
    """A solid 3x3 plateau at v=5 in an empty plain: the contour ring
    is exactly the blocks around its boundary; interior block is case
    15 (omitted); saddle-free."""
    from cdap_geo_spark.operators.zonal import marching_squares
    rows = [(x, y, 5) for x in (10, 11, 12) for y in (10, 11, 12)]
    df = spark.createDataFrame(rows, "cx long, cy long, v long")
    got = {(r.bx, r.by): r.case_id
           for r in marching_squares(df, iso=5).collect()}
    # 4x4 block ring minus the single all-inside center 2x2 region
    assert (10, 10) not in got and (11, 11) not in got  # case-15 interior
    assert got[(9, 9)] == 4     # lower-left corner block: only UR corner in
    assert got[(12, 12)] == 1   # upper-right corner block: only LL corner in
    assert len(got) == 12       # 16 blocks - 4 interior case-15
    import pytest as _pt
    with _pt.raises(ValueError):
        marching_squares(df, iso=0)


def test_knox_brute_force(spark):
    """knox_pairs == python brute force over all pairs (space, time,
    both), including the ratio."""
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.zonal import knox_pairs
    random.seed(31)
    t0 = dtm.datetime(2026, 1, 1, tzinfo=dtm.timezone.utc)
    delta, tau_us = 15, 60_000_000  # 15 units, 60 s
    rows = []
    pts = []
    for i in range(150):
        x, y = random.randrange(120), random.randrange(120)
        ts = t0 + dtm.timedelta(seconds=random.randrange(3600))
        rows.append((i, ts, x, y))
        pts.append((i, int(ts.timestamp() * 1e6), x, y))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, x long, y long")
    (r,) = knox_pairs(df, delta=delta, tau_us=tau_us).collect()

    n_sp = n_tm = n_bo = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            _, ti, xi, yi = pts[i]
            _, tj, xj, yj = pts[j]
            s = (xi - xj) ** 2 + (yi - yj) ** 2 <= delta * delta
            t = abs(ti - tj) <= tau_us
            n_sp += s
            n_tm += t
            n_bo += s and t
    assert (r.n_events, r.n_space_pairs, r.n_time_pairs,
            r.n_both_pairs) == (150, n_sp, n_tm, n_bo)
    npairs = 150 * 149 / 2.0
    assert r.knox_u == round(1e6 * (n_bo * npairs) / (n_sp * n_tm))


def test_knox_degenerate_and_validates(spark):
    import datetime as dtm
    import pytest as _pt
    from cdap_geo_spark.operators.zonal import knox_pairs
    t0 = dtm.datetime(2026, 1, 1)
    # two events far apart in space and time: no close pairs at all
    df = spark.createDataFrame(
        [(1, t0, 0, 0), (2, t0 + dtm.timedelta(days=30), 10**6, 10**6)],
        "event_id long, ts timestamp, x long, y long")
    (r,) = knox_pairs(df, delta=10, tau_us=1_000_000).collect()
    assert (r.n_space_pairs, r.n_time_pairs, r.n_both_pairs) == (0, 0, 0)
    assert r.knox_u is None
    with _pt.raises(ValueError):
        knox_pairs(df, delta=0, tau_us=1)
    with _pt.raises(ValueError):
        knox_pairs(df, delta=1, tau_us=0)


def test_local_morans_brute_force(spark):
    import random
    from cdap_geo_spark.operators.zonal import local_morans
    random.seed(37)
    n = 25
    vals = [(i, random.randrange(100)) for i in range(n)]
    edges = []
    for i in range(n):       # ring + a few chords, both directions
        edges += [(i, (i + 1) % n), ((i + 1) % n, i)]
    edges += [(0, 12), (12, 0), (3, 17), (17, 3)]
    vdf = spark.createDataFrame(vals, "id long, x long")
    edf = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: (r.n_neighbors, r.zlag, r.num, r.quad, r.i_micro)
           for r in local_morans(vdf, edf).collect()}

    s = sum(x for _, x in vals)
    mean = s // n
    z = {i: x - mean for i, x in vals}
    den = sum(v * v for v in z.values())
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
    want = {}
    for i, ns in nbrs.items():
        lag = sum(z[j] for j in ns)
        num = z[i] * lag
        quad = ("HH" if z[i] >= 0 and lag >= 0 else
                "LL" if z[i] < 0 and lag < 0 else
                "HL" if z[i] >= 0 else "LH")
        want[i] = (len(ns), lag, num, quad, round(n * num / den * 1e6))
    assert got == want
    # local Morans sum to the global numerator scaled: sum(num) == global num
    from cdap_geo_spark.operators.zonal import morans_i
    (g,) = morans_i(vdf, edf).collect()
    assert sum(v[2] for v in got.values()) == g.num


def test_ripley_k_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import ripley_k
    random.seed(43)
    n, side = 120, 1000
    pts = [(i, random.randrange(side), random.randrange(side))
           for i in range(n)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    radii, area = [50, 150, 400], side * side
    got = {r.r: (r.n_pairs, r.k_micro, r.l_micro)
           for r in ripley_k(df, radii=radii, area=area).collect()}
    for r in radii:
        cnt = sum(1 for i, ax, ay in pts for j, bx, by in pts
                  if i != j
                  and (ax - bx) ** 2 + (ay - by) ** 2 <= r * r)
        kd = area * cnt / (n * (n - 1))
        want = (cnt, round(kd * 1e6), round(math.sqrt(kd / math.pi) * 1e6))
        assert got[r] == want, (r, got[r], want)


def test_ripley_k_validation(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.zonal import ripley_k
    df = spark.createDataFrame([(1, 2, 3)], "id long, x long, y long")
    with _pt.raises(ValueError):
        ripley_k(df, radii=[], area=100)
    with _pt.raises(ValueError):
        ripley_k(df, radii=[0, 5], area=100)
    with _pt.raises(ValueError):
        ripley_k(df, radii=[5], area=0)


def test_variogram_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import variogram
    random.seed(47)
    n, side = 100, 800
    pts = [(i, random.randrange(side), random.randrange(side),
            random.randrange(50)) for i in range(n)]
    df = spark.createDataFrame(pts, "id long, x long, y long, z long")
    h_max, n_bins = 300, 6
    width = h_max // n_bins
    got = {r.bin: (r.lo, r.hi, r.n_pairs, r.gamma_micro)
           for r in variogram(df, h_max=h_max, n_bins=n_bins).collect()}
    want = {}
    acc = {}
    for i, ax, ay, az in pts:
        for j, bx, by, bz in pts:
            if i >= j:
                continue
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if d2 >= h_max * h_max:
                continue
            b = math.isqrt(d2) // width
            c, s = acc.get(b, (0, 0))
            acc[b] = (c + 1, s + (az - bz) ** 2)
    for b, (c, s) in acc.items():
        # Spark/DuckDB ROUND is half-away-from-zero; python round is
        # half-even — γ hits exact .5 ties (integer num / 2c)
        want[b] = (b * width, (b + 1) * width, c,
                   math.floor(s / (2 * c) * 1e6 + 0.5))
    assert got == want


def test_variogram_validation(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.zonal import variogram
    df = spark.createDataFrame([(1, 2, 3, 4)],
                               "id long, x long, y long, z long")
    with _pt.raises(ValueError):
        variogram(df, h_max=10, n_bins=3)   # not an exact divisor
    with _pt.raises(ValueError):
        variogram(df, h_max=0, n_bins=1)


def test_colocation_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import colocation
    random.seed(53)
    n, side, dist = 90, 500, 60
    types = ["shop", "cafe", "bank"]
    pts = [(i, random.randrange(side), random.randrange(side),
            types[random.randrange(3)]) for i in range(n)]
    df = spark.createDataFrame(pts, "id long, x long, y long, t string")
    got = {(r.type_a, r.type_b): (r.n_a, r.n_b, r.n_a_near_b,
                                  r.n_b_near_a, r.pi_micro)
           for r in colocation(df, dist=dist).collect()}
    near = {}      # (type_from, type_to) -> set of participating ids
    for i, ax, ay, ta in pts:
        for j, bx, by, tb in pts:
            if i == j or ta == tb:
                continue
            if (ax - bx) ** 2 + (ay - by) ** 2 <= dist * dist:
                near.setdefault((ta, tb), set()).add(i)
    cnt = {}
    for _, _, _, t in pts:
        cnt[t] = cnt.get(t, 0) + 1
    want = {}
    for ta in types:
        for tb in types:
            if ta >= tb or (ta, tb) not in near:
                continue
            nab, nba = len(near[(ta, tb)]), len(near[(tb, ta)])
            na, nb = cnt[ta], cnt[tb]
            pi = (math.floor(nab / na * 1e6 + 0.5)
                  if nab * nb <= nba * na
                  else math.floor(nba / nb * 1e6 + 0.5))
            want[(ta, tb)] = (na, nb, nab, nba, pi)
    assert got == want
    # PI is symmetric in construction: every emitted pair has both
    # directions participating (a cross-type pair feeds both)
    assert all(v[2] >= 1 and v[3] >= 1 for v in got.values())


def test_quadrat_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import quadrat_test
    random.seed(59)
    w, h, gx, gy = 120, 80, 6, 4
    k = gx * gy
    # clustered blob + sparse noise so several quadrats stay EMPTY
    pts = ([(random.randrange(20), random.randrange(20))
            for _ in range(70)]
           + [(random.randrange(w), random.randrange(h))
              for _ in range(30)])
    df = spark.createDataFrame(pts, "x long, y long")
    (row,) = quadrat_test(df, width=w, height=h, gx=gx, gy=gy).collect()
    cw, ch = w // gx, h // gy
    obs = {}
    for x, y in pts:
        q = (x // cw, y // ch)
        obs[q] = obs.get(q, 0) + 1
    n = len(pts)
    num = (sum((k * c - n) ** 2 for c in obs.values())
           + (k - len(obs)) * n * n)
    assert (row.n, row.k, row.occupied) == (n, k, len(obs))
    assert row.chi2_micro == math.floor(num / (n * k) * 1e6 + 0.5)
    assert row.vmr_micro == math.floor(num / (n * k * (k - 1)) * 1e6
                                       + 0.5)
    # clustered blob must read as strongly over-dispersed
    assert row.vmr_micro > 1_000_000


def test_quadrat_validation(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.zonal import quadrat_test
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with _pt.raises(ValueError):
        quadrat_test(df, width=100, height=100, gx=3, gy=2)
    with _pt.raises(ValueError):
        quadrat_test(df, width=100, height=100, gx=1, gy=1)


def test_location_quotient_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import location_quotient
    random.seed(61)
    rows = [(random.randrange(6), random.choice("abc"))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "region long, t string")
    got = {(r.region, r.t): (r.n_rt, r.n_r, r.n_t, r.lq_micro)
           for r in location_quotient(df).collect()}
    n = len(rows)
    from collections import Counter
    rt = Counter(rows)
    rc = Counter(r for r, _ in rows)
    tc = Counter(t for _, t in rows)
    want = {(r, t): (c, rc[r], tc[t],
                     math.floor(c * n / (rc[r] * tc[t]) * 1e6 + 0.5))
            for (r, t), c in rt.items()}
    assert got == want
    # share-weighted mean of LQ over types within a region is 1 by
    # construction: sum_t n_rt*LQ/n_r = n * sum_t n_rt/(n_r*n_t) ...
    # pin instead the exact identity sum_t n_rt = n_r per region
    for r in rc:
        assert sum(v[0] for (rr, _), v in got.items() if rr == r) \
            == rc[r]


def test_join_counts_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import join_counts
    random.seed(67)
    n = 30
    flags = [(i, random.randrange(2)) for i in range(n)]
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if random.random() < 0.2]
    vdf = spark.createDataFrame(flags, "id long, is_b long")
    edf = spark.createDataFrame(edges, "a long, b long")
    (row,) = join_counts(vdf, edf).collect()
    f = dict(flags)
    nb = sum(f.values())
    nw = n - nb
    bb = sum(1 for a, b in edges if f[a] and f[b])
    ww = sum(1 for a, b in edges if not f[a] and not f[b])
    bw = len(edges) - bb - ww
    w = len(edges)
    assert (row.n, row.n_b, row.w_pairs, row.bb, row.bw, row.ww) \
        == (n, nb, w, bb, bw, ww)
    nn1 = n * (n - 1)

    def ratio(o, e):
        return math.floor(o * nn1 / e * 1e6 + 0.5) if e > 0 else None

    assert row.bb_ratio_micro == ratio(bb, w * nb * (nb - 1))
    assert row.bw_ratio_micro == ratio(bw, 2 * w * nb * nw)
    assert row.ww_ratio_micro == ratio(ww, w * nw * (nw - 1))


def test_join_counts_all_one_color(spark):
    """All-B map: bw == ww == 0, bb == W, and the W/BW expectations
    are degenerate (NULL ratios)."""
    from cdap_geo_spark.operators.zonal import join_counts
    vdf = spark.createDataFrame([(i, 1) for i in range(4)],
                                "id long, is_b long")
    edf = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                "a long, b long")
    (row,) = join_counts(vdf, edf).collect()
    assert (row.bb, row.bw, row.ww) == (3, 0, 0)
    assert row.bb_ratio_micro == 1_000_000
    assert row.bw_ratio_micro is None and row.ww_ratio_micro is None


def _mk_brute(series, pmin, pmax, missing_as_zero):
    """Python Mann-Kendall over a {period: value} dict."""
    import math
    if missing_as_zero:
        xs = [series.get(p, 0) for p in range(pmin, pmax + 1)]
    else:
        xs = [series[p] for p in sorted(series)]
    t = len(xs)
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t) for j in range(i + 1, t))
    from collections import Counter
    groups = Counter(xs).values()
    var18 = (t * (t - 1) * (2 * t + 5)
             - sum(g * (g - 1) * (2 * g + 5) for g in groups))
    if var18 <= 0:
        z = None
    elif s > 0:
        z = math.floor((s - 1) / math.sqrt(var18 / 18.0) * 1e6 + 0.5)
    elif s < 0:
        z = -math.floor(-(s + 1) / math.sqrt(var18 / 18.0) * 1e6 + 0.5)
    else:
        z = 0
    trend = "rising" if s > 0 else "falling" if s < 0 else "flat"
    return (t, len(series), s, var18, trend, z)


def test_mann_kendall_brute_force(spark):
    import random
    from cdap_geo_spark.operators.zonal import mann_kendall
    random.seed(73)
    keys = list(range(8))
    rows, truth = [], {}
    for k in keys:
        # sparse series with gaps, repeats (ties) and 1-100 values
        periods = sorted(random.sample(range(100, 120),
                                       random.randrange(1, 15)))
        series = {p: random.randrange(1, 6) for p in periods}
        truth[k] = series
        rows += [(k, p, c) for p, c in series.items()]
    df = spark.createDataFrame(rows, "k long, p long, c long")
    pmin = min(p for s in truth.values() for p in s)
    pmax = max(p for s in truth.values() for p in s)
    for maz in (True, False):
        got = {r.k: (r.t_periods, r.occ, r.s, r.var18, r.trend,
                     r.z_micro)
               for r in mann_kendall(df, key_cols=["k"],
                                     missing_as_zero=maz).collect()}
        want = {k: _mk_brute(s, pmin, pmax, maz)
                for k, s in truth.items()}
        assert got == want, f"missing_as_zero={maz}"


def test_mann_kendall_validation_and_flat(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.zonal import mann_kendall
    df = spark.createDataFrame([(1, 5, 0)], "k long, p long, c long")
    with _pt.raises(ValueError):
        mann_kendall(df, key_cols=["k"])          # zero value
    with _pt.raises(ValueError):
        mann_kendall(df, key_cols=[])
    # constant full series: S=0, all tied -> var18=0, z NULL, flat
    full = spark.createDataFrame([(1, p, 7) for p in range(10)],
                                 "k long, p long, c long")
    (r,) = mann_kendall(full, key_cols=["k"]).collect()
    assert (r.s, r.var18, r.trend, r.z_micro) == (0, 0, "flat", None)


def test_huff_model_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import huff_model
    random.seed(89)
    dem = [(i, random.randrange(100), random.randrange(100))
           for i in range(12)]
    sto = [(s, random.randrange(100), random.randrange(100),
            random.randrange(1, 50)) for s in range(9)]
    # duplicate-weight tie: two stores co-located with equal attract
    sto += [(100, 7, 7, 10), (101, 7, 7, 10)]
    ddf = spark.createDataFrame(dem, "k long, x long, y long")
    sdf = spark.createDataFrame(
        sto, "store_id long, sx long, sy long, a long")
    got = {r.k: (r.sum_w_micro, r.best_store, r.best_w_micro,
                 r.best_p_micro)
           for r in huff_model(ddf, sdf, demand_keys=["k"]).collect()}

    def rnd(v):
        return math.floor(v * 1e6 + 0.5)

    want = {}
    for k, x, y in dem:
        ws = {s: rnd(a / ((x - sx) ** 2 + (y - sy) ** 2 + 1))
              for s, sx, sy, a in sto}
        sw = sum(ws.values())
        bw = max(ws.values())
        bs = min(s for s, w in ws.items() if w == bw)
        want[k] = (sw, bs, bw, rnd(bw / sw) if sw > 0 else None)
    assert got == want


def test_catchment_2sfca_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import catchment_2sfca
    random.seed(97)
    dem = [(i, random.randrange(200), random.randrange(200),
            random.randrange(1, 30)) for i in range(15)]
    sup = [(s, random.randrange(200), random.randrange(200),
            random.randrange(5, 40)) for s in range(6)]
    d0 = 60
    ddf = spark.createDataFrame(dem, "k long, x long, y long, pop long")
    sdf = spark.createDataFrame(
        sup, "site_id long, sx long, sy long, cap long")
    got = {r.k: (r.n_sites, r.access_micro)
           for r in catchment_2sfca(ddf, sdf, d0=d0,
                                    demand_keys=["k"]).collect()}
    rs = {}
    for s, sx, sy, cap in sup:
        p = sum(pop for _, x, y, pop in dem
                if (x - sx) ** 2 + (y - sy) ** 2 <= d0 * d0)
        if p > 0:
            rs[s] = math.floor(cap * 1e6 / p + 0.5)
    want = {}
    for k, x, y, _ in dem:
        near = [rs[s] for s, sx, sy, _ in sup
                if s in rs and (x - sx) ** 2 + (y - sy) ** 2 <= d0 * d0]
        if near:
            want[k] = (len(near), sum(near))
    assert got == want
    import pytest as _pt
    with _pt.raises(ValueError):
        catchment_2sfca(ddf, sdf, d0=0, demand_keys=["k"])


def test_slope_aspect_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import slope_aspect
    random.seed(101)
    cells = {}
    for _ in range(60):
        cells[(random.randrange(8), random.randrange(8))] = \
            random.randrange(1, 30)
    rows = [(x, y, z) for (x, y), z in cells.items()]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    cell = 10
    got = {(r.cx, r.cy): (r.z, r.gx8, r.gy8, r.slope_micro, r.octant)
           for r in slope_aspect(df, cell=cell).collect()}

    def zat(x, y):
        return cells.get((x, y), 0)

    want = {}
    for (x, y), z in cells.items():
        a, b, c = zat(x-1, y+1), zat(x, y+1), zat(x+1, y+1)
        d, f = zat(x-1, y), zat(x+1, y)
        g, h, i = zat(x-1, y-1), zat(x, y-1), zat(x+1, y-1)
        gx8 = (c + 2*f + i) - (a + 2*d + g)
        gy8 = (a + 2*b + c) - (g + 2*h + i)
        slope = math.floor(math.sqrt(gx8*gx8 + gy8*gy8)
                           / (8 * cell) * 1e6 + 0.5)
        if gx8 == 0 and gy8 == 0:
            oct_ = "flat"
        elif 2 * abs(gy8) <= abs(gx8):
            oct_ = "E" if gx8 > 0 else "W"
        elif 2 * abs(gx8) <= abs(gy8):
            oct_ = "N" if gy8 > 0 else "S"
        else:
            oct_ = ("N" if gy8 > 0 else "S") + ("E" if gx8 > 0 else "W")
        want[(x, y)] = (z, gx8, gy8, slope, oct_)
    assert got == want
    import pytest as _pt
    with _pt.raises(ValueError):
        slope_aspect(df, cell=0)


def test_slope_aspect_flat_plateau(spark):
    """Uniform interior of a constant plateau has zero gradient."""
    from cdap_geo_spark.operators.zonal import slope_aspect
    rows = [(x, y, 7) for x in range(5) for y in range(5)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {(r.cx, r.cy): (r.gx8, r.gy8, r.octant)
           for r in slope_aspect(df, cell=1).collect()}
    for x in range(1, 4):
        for y in range(1, 4):
            assert got[(x, y)] == (0, 0, "flat")


def test_getis_ord_gstar_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import getis_ord_gstar
    random.seed(41)
    n = 25
    vals = [(i, random.randrange(100)) for i in range(n)]
    edges = []
    for i in range(n):       # ring + chords, both directions
        edges += [(i, (i + 1) % n), ((i + 1) % n, i)]
    edges += [(0, 12), (12, 0), (5, 19), (19, 5)]
    vdf = spark.createDataFrame(vals, "id long, x long")
    edf = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: (r.k, r.lag, r.a_num, r.label, r.g_micro)
           for r in getis_ord_gstar(vdf, edf).collect()}

    x = dict(vals)
    s = sum(x.values())
    ss = sum(v * v for v in x.values())
    nbrs = {i: [i] for i in x}           # star variant: self included
    for a, b in edges:
        nbrs[a].append(b)
    want = {}
    for i, ns in nbrs.items():
        k, lag = len(ns), sum(x[j] for j in ns)
        a_num = n * lag - s * k
        label = "HOT" if a_num > 0 else "COLD" if a_num < 0 else "NONE"
        g = round(a_num / (math.sqrt(n * ss - s * s)
                           * math.sqrt((n * k - k * k) / (n - 1))) * 1e6)
        want[i] = (k, lag, a_num, label, g)
    assert got == want
    # classic Gi* check: z-scores sum to ~0 under equal weights is NOT
    # guaranteed, but the numerators weighted by nothing must satisfy
    # sum_i A_i = n*sum_i lag_i - s*sum_i k_i exactly
    assert (sum(v[2] for v in got.values())
            == n * sum(v[1] for v in got.values())
            - s * sum(v[0] for v in got.values()))


def test_getis_ord_all_equal_values(spark):
    """Constant surface: every A_i is exactly 0, label NONE, and the
    global variance term n*ss - s*s == 0 so g_micro is NULL."""
    from cdap_geo_spark.operators.zonal import getis_ord_gstar
    vdf = spark.createDataFrame([(i, 7) for i in range(6)],
                                "id long, x long")
    edf = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)]
        + [((i + 1) % 6, i) for i in range(6)], "a long, b long")
    rows = getis_ord_gstar(vdf, edf).collect()
    assert len(rows) == 6
    assert all(r.a_num == 0 and r.label == "NONE" and r.g_micro is None
               for r in rows)


def test_knox_plan_has_no_nested_loop(spark):
    """Both knox DATA joins must plan as equi-joins (cell key, bin
    key) — a CartesianProduct would be the all-pairs plan the operator
    exists to avoid. (The final 1-row stat combines are broadcast
    nested loops over single-row aggregates — bounded by design.)"""
    import datetime as dtm
    from cdap_geo_spark.operators.zonal import knox_pairs
    t0 = dtm.datetime(2026, 1, 1)
    rows = [(i, t0 + dtm.timedelta(seconds=i * 7), (i * 13) % 500,
             (i * 29) % 500) for i in range(500)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, x long, y long")
    plan = knox_pairs(df, delta=20, tau_us=60_000_000) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_geofence_transitions_brute_force(spark):
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.zonal import geofence_transitions
    random.seed(43)
    t0 = dtm.datetime(2026, 1, 1, tzinfo=dtm.timezone.utc)
    fences = [(j, x0, y0, x0 + 40, y0 + 40)
              for j, (x0, y0) in enumerate(
                  (random.randrange(100), random.randrange(100))
                  for _ in range(6))]
    ev = []
    for u in range(8):
        for i in range(40):
            ev.append((u, u * 1000 + i,
                       t0 + dtm.timedelta(seconds=i * 10),
                       random.randrange(140), random.randrange(140)))
    edf = spark.createDataFrame(
        ev, "user_id long, event_id long, ts timestamp, x long, y long")
    fdf = spark.createDataFrame(
        fences, "fence_id long, minx long, miny long, maxx long, maxy long")
    got = {(r.user_id, r.event_id, r.fence_id, r.kind)
           for r in geofence_transitions(edf, fdf, cell=50).collect()}

    want = set()
    for u in range(8):
        seq = sorted((e for e in ev if e[0] == u),
                     key=lambda e: (e[2], e[1]))
        prev = set()
        for _, eid, _, x, y in seq:
            cur = {j for j, x0, y0, x1, y1 in fences
                   if x0 <= x <= x1 and y0 <= y <= y1}
            for j in cur - prev:
                want.add((u, eid, j, "enter"))
            for j in prev - cur:
                want.add((u, eid, j, "exit"))
            prev = cur
    assert want and got == want
    assert any(k == "exit" for _, _, _, k in got)


def test_geofence_boundary_and_first_event(spark):
    import datetime as dtm
    from cdap_geo_spark.operators.zonal import geofence_transitions
    t0 = dtm.datetime(2026, 1, 1)
    # boundary point is inside (closed box); first event inside = enter
    ev = [(1, 1, t0, 10, 10),                              # on corner
          (1, 2, t0 + dtm.timedelta(seconds=1), 50, 50),   # inside
          (1, 3, t0 + dtm.timedelta(seconds=2), 99, 10)]   # outside
    fdf = spark.createDataFrame([(7, 10, 10, 60, 60)],
                                "fence_id long, minx long, miny long, "
                                "maxx long, maxy long")
    edf = spark.createDataFrame(
        ev, "user_id long, event_id long, ts timestamp, x long, y long")
    got = {(r.event_id, r.kind) for r in
           geofence_transitions(edf, fdf, cell=64).collect()}
    assert got == {(1, "enter"), (3, "exit")}
    import pytest as _pt
    with _pt.raises(ValueError):
        geofence_transitions(edf, fdf, cell=0)


def test_clark_evans_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import clark_evans
    random.seed(103)
    n, side, dmax = 80, 400, 150
    pts = [(i, random.randrange(side), random.randrange(side))
           for i in range(n)]
    # an isolated far-away point -> censored at d_max
    pts.append((999, 5000, 5000))
    df = spark.createDataFrame(pts, "id long, x long, y long")
    area = 6000 * 6000
    (row,) = clark_evans(df, area=area, d_max=dmax).collect()
    nns = []
    for i, ax, ay in pts:
        best = None
        for j, bx, by in pts:
            if i == j:
                continue
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if best is None or d2 < best:
                best = d2
        if best is not None and best <= dmax * dmax:
            nns.append(math.isqrt(best))
    ntot = len(pts)
    s_micro = sum(d * 1000000 for d in nns)
    r = math.floor(s_micro / 1e6 * 2.0
                   * math.sqrt(ntot / area) / len(nns) * 1e6 + 0.5)
    assert (row.n, row.n_censored, row.sum_nn_micro, row.r_micro) \
        == (ntot, ntot - len(nns), s_micro, r)
    assert row.n_censored == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        clark_evans(df, area=0, d_max=10)


def test_centrography_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import centrography
    random.seed(107)
    rows = [(random.choice("uv"), random.randrange(500),
             random.randrange(500)) for _ in range(120)]
    # an anisotropic group stretched along x: ell_den > 0, num ~ 0
    rows += [("w", 100 + 5 * i, 200 + (i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: (r.n, r.mcx_micro, r.mcy_micro, r.sdist_micro,
                 r.ell_num, r.ell_den)
           for r in centrography(df).collect()}
    from collections import defaultdict
    gs = defaultdict(list)
    for g, x, y in rows:
        gs[g].append((x, y))
    want = {}
    for g, pts in gs.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        vx, vy, cxy = n*sxx - sx*sx, n*syy - sy*sy, n*sxy - sx*sy
        want[g] = (n,
                   math.floor(sx / n * 1e6 + 0.5),
                   math.floor(sy / n * 1e6 + 0.5),
                   math.floor(math.sqrt(vx + vy) / n * 1e6 + 0.5),
                   2 * cxy, vx - vy)
    assert got == want
    # the stretched group's ellipse leans along x
    assert got["w"][5] > 0


def test_segregation_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import segregation
    random.seed(127)
    rows = [(random.randrange(8), random.randrange(2))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "region long, is_b long")
    (row,) = segregation(df).collect()
    from collections import defaultdict
    reg = defaultdict(lambda: [0, 0])
    for r, f in rows:
        reg[r][f] += 1
    bt = sum(v[1] for v in reg.values())
    wt = sum(v[0] for v in reg.values())
    dnum = sum(abs(v[1] * wt - v[0] * bt) for v in reg.values())

    def xlnx(c):
        return c * math.log(c) if c > 0 else 0.0

    esum = sum(math.floor((xlnx(w + b) - xlnx(b) - xlnx(w)) * 1e6
                          + 0.5)
               for w, b in reg.values())
    d = math.floor(dnum / (2 * bt * wt) * 1e6 + 0.5)
    te = xlnx(bt + wt) - xlnx(bt) - xlnx(wt)
    hval = (1.0 - esum / 1e6 / te) * 1e6
    h = (math.floor(hval + 0.5) if hval >= 0
         else -math.floor(-hval + 0.5))
    assert (row.n_regions, row.b_total, row.w_total,
            row.d_micro, row.h_micro) == (len(reg), bt, wt, d, h)


def test_segregation_extremes(spark):
    """Perfectly even split -> D = 0, H ~ 0; full separation ->
    D = H = 1."""
    from cdap_geo_spark.operators.zonal import segregation
    even = [(r, f) for r in range(4) for f in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(even, "region long, is_b long")
    (r1,) = segregation(df).collect()
    assert r1.d_micro == 0 and abs(r1.h_micro) <= 5
    apart = [(0, 1)] * 10 + [(1, 0)] * 10
    df2 = spark.createDataFrame(apart, "region long, is_b long")
    (r2,) = segregation(df2).collect()
    assert r2.d_micro == 1_000_000
    assert abs(r2.h_micro - 1_000_000) <= 5


def test_round5p_cell_join_plans_have_no_nested_loop(spark):
    """Every round-5p pair-generating operator must plan its DATA
    join as an equi-join on cell keys — a CartesianProduct would be
    the all-pairs plan these operators exist to avoid. (1-row stat
    combines are broadcast nested loops over single-row aggregates —
    bounded by design, not checked here.)"""
    from cdap_geo_spark.operators.cluster import dbscan
    from cdap_geo_spark.operators.zonal import (catchment_2sfca,
                                                clark_evans,
                                                colocation, ripley_k,
                                                variogram)
    pts = spark.createDataFrame(
        [(i, (i * 13) % 300, (i * 29) % 300, 1 + i % 5,
          "ab"[i % 2]) for i in range(200)],
        "id long, x long, y long, z long, t string")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    checks = {
        "ripley_k": ripley_k(pts, radii=[10, 30], area=300 * 300),
        "variogram": variogram(pts, h_max=30, n_bins=3),
        "colocation": colocation(pts, dist=25),
        "clark_evans": clark_evans(pts, area=300 * 300, d_max=40),
        "dbscan": dbscan(pts, eps=20, min_pts=3),
        "2sfca": catchment_2sfca(
            pts.selectExpr("id AS k", "x", "y", "z AS pop"),
            pts.selectExpr("id AS site_id", "x AS sx", "y AS sy",
                           "z AS cap"),
            d0=30, demand_keys=["k"]),
    }
    for name, df in checks.items():
        p = plan(df)
        # strip the 1-row combine tail: assert the data joins are
        # hash/sort-merge equi-joins and nothing is a data-sized
        # cartesian (single-row BroadcastNestedLoop combines print as
        # BroadcastNestedLoopJoin, never CartesianProduct)
        assert "CartesianProduct" not in p, name
        assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p), \
            name


def test_scan_statistic_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import scan_statistic
    random.seed(137)
    # background noise + a planted outbreak at cell (2,2), weeks 5-7
    cube = {}
    for x in range(4):
        for y in range(4):
            for p in range(10):
                if random.random() < 0.7:
                    cube[(x, y, p)] = random.randrange(1, 6)
    for p in (5, 6, 7):
        cube[(2, 2, p)] = cube.get((2, 2, p), 0) + 40
    rows = [(x, y, p, c) for (x, y, p), c in cube.items()]
    df = spark.createDataFrame(rows, "qx long, qy long, p long, c long")
    got = [(r.qx, r.qy, r.t1, r.t2, r.c, r.e_micro, r.llr_micro)
           for r in scan_statistic(df, top_k=5).collect()]

    call = sum(cube.values())
    cells = {(x, y) for x, y, _ in cube}
    cand = []
    for (x, y) in cells:
        times = sorted(p for (cx, cy, p) in cube if (cx, cy) == (x, y))
        ct = sum(c for (cx, cy, _), c in cube.items()
                 if (cx, cy) == (x, y))
        for i, t1 in enumerate(times):
            for t2 in times[i:]:
                c = sum(cc for (cx, cy, p), cc in cube.items()
                        if (cx, cy) == (x, y) and t1 <= p <= t2)
                win = sum(cc for (_, _, p), cc in cube.items()
                          if t1 <= p <= t2)
                e = ct / call * win / call * call
                if c > e and c < call:
                    llr = (c * math.log(c / e)
                           + (call - c) * math.log((call - c)
                                                   / (call - e)))
                    lm = math.floor(llr * 1e6 + 0.5)
                else:
                    lm = 0
                em = math.floor(e * 1e6 + 0.5)
                cand.append((x, y, t1, t2, c, em, lm))
    cand.sort(key=lambda r: (-r[6], r[0], r[1], r[2], r[3]))
    assert got == cand[:5]
    # the planted outbreak zone must win
    assert (got[0][0], got[0][1]) == (2, 2)
    assert got[0][2] >= 5 and got[0][3] <= 7
    import pytest as _pt
    with _pt.raises(ValueError):
        scan_statistic(df, top_k=0)


def test_spatial_markov_brute_force(spark):
    import random
    from cdap_geo_spark.operators.zonal import spatial_markov
    random.seed(151)
    cube = {}
    for x in range(5):
        for y in range(5):
            for p in range(8):
                if random.random() < 0.8:
                    cube[(x, y, p)] = random.randrange(1, 40)
    rows = [(x, y, p, c) for (x, y, p), c in cube.items()]
    df = spark.createDataFrame(rows, "qx long, qy long, p long, c long")
    for cuts in [((10, 25), (60, 160)), (None, None)]:
        got = {(r.nbr_class, r.own_class, r.next_class): r.n_transitions
               for r in spatial_markov(df, own_cuts=cuts[0],
                                       nbr_cuts=cuts[1]).collect()}
        nn = len(cube)
        tt = sum(cube.values())

        def cls(v, fixed, mult):
            if fixed:
                return 0 if v < fixed[0] else 1 if v < fixed[1] else 2
            lhs = v * nn
            return (0 if lhs < mult * tt
                    else 1 if lhs < 2 * mult * tt else 2)

        want = {}
        for (x, y, p), c in cube.items():
            if (x, y, p + 1) not in cube:
                continue
            nbr = sum(cube.get((x + dx, y + dy, p), 0)
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                      if (dx, dy) != (0, 0))
            key = (cls(nbr, cuts[1], 8), cls(c, cuts[0], 1),
                   cls(cube[(x, y, p + 1)], cuts[0], 1))
            want[key] = want.get(key, 0) + 1
        assert got == want, cuts
        # a gap (missing p+1) never pairs across: total transitions
        # equal the count of consecutive-present pairs
        assert sum(got.values()) == sum(
            1 for (x, y, p) in cube if (x, y, p + 1) in cube)


def test_general_g_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import general_g
    random.seed(157)
    n = 25
    vals = [(i, random.randrange(100)) for i in range(n)]
    edges = []
    for i in range(n):
        edges += [(i, (i + 1) % n), ((i + 1) % n, i)]
    edges += [(0, 12), (12, 0)]
    vdf = spark.createDataFrame(vals, "id long, x long")
    edf = spark.createDataFrame(edges, "a long, b long")
    (row,) = general_g(vdf, edf).collect()
    x = dict(vals)
    num = sum(x[a] * x[b] for a, b in edges)
    s = sum(x.values())
    ss = sum(v * v for v in x.values())
    den = s * s - ss
    assert (row.n, row.w_pairs, row.num, row.den) \
        == (n, len(edges), num, den)
    assert row.g_micro == math.floor(num / den * 1e6 + 0.5)
    import pytest as _pt
    with _pt.raises(ValueError):
        general_g(spark.createDataFrame([(1, -5)], "id long, x long"),
                  edf)


def test_flow_field_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import flow_field
    random.seed(163)
    mv = [(random.randrange(300), random.randrange(300),
           random.randrange(-40, 41), random.randrange(-40, 41))
          for _ in range(150)]
    # a cell whose vectors exactly cancel -> flat octant
    mv += [(500, 500, 7, 3), (510, 505, -7, -3)]
    df = spark.createDataFrame(mv, "x long, y long, dx long, dy long")
    got = {(r.cx, r.cy): (r.n, r.sum_dx, r.sum_dy, r.octant,
                          r.speed_micro)
           for r in flow_field(df, cell=100).collect()}
    from collections import defaultdict
    acc = defaultdict(lambda: [0, 0, 0])
    for x, y, dx, dy in mv:
        a = acc[(x // 100, y // 100)]
        a[0] += 1
        a[1] += dx
        a[2] += dy
    want = {}
    for k, (n, sx, sy) in acc.items():
        if sx == 0 and sy == 0:
            o = "flat"
        elif 2 * abs(sy) <= abs(sx):
            o = "E" if sx > 0 else "W"
        elif 2 * abs(sx) <= abs(sy):
            o = "N" if sy > 0 else "S"
        else:
            o = ("N" if sy > 0 else "S") + ("E" if sx > 0 else "W")
        want[k] = (n, sx, sy, o,
                   math.floor(math.sqrt(sx*sx + sy*sy) / n * 1e6
                              + 0.5))
    assert got == want
    assert got[(5, 5)][3] == "flat"


def test_cross_k_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import cross_k
    random.seed(173)
    w, h = 500, 400
    a = [(random.randrange(w), random.randrange(h)) for _ in range(40)]
    # B clustered NEAR A points -> attraction at shift 0
    b = [((x + random.randrange(-15, 16)) % w,
          (y + random.randrange(-15, 16)) % h)
         for x, y in random.sample(a, 30)]
    shifts = [(0, 0), (123, 217), (250, 200)]
    radii = [20, 60]
    adf = spark.createDataFrame(a, "x long, y long")
    bdf = spark.createDataFrame(b, "x long, y long")
    got = {(r.shift_id, r.r): (r.n_pairs, r.k_micro)
           for r in cross_k(adf, bdf, radii=radii, width=w, height=h,
                            shifts=shifts).collect()}
    want = {}
    for sid, (sx, sy) in enumerate(shifts):
        bs = [((x + sx) % w, (y + sy) % h) for x, y in b]
        for r in radii:
            cnt = sum(1 for ax, ay in a for bx, by in bs
                      if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r)
            kd = w * h * cnt / (len(a) * len(b))
            want[(sid, r)] = (cnt, math.floor(kd * 1e6 + 0.5))
    # shifts with zero candidate pairs produce no rows in either
    # engine; compare on the union of observed keys
    want = {k: v for k, v in want.items()
            if k in got or v[0] > 0}
    assert got == want
    # planted attraction: observed K at r=20 beats both nulls
    assert got[(0, 20)][1] > max(
        got.get((s, 20), (0, 0))[1] for s in (1, 2))
    import pytest as _pt
    with _pt.raises(ValueError):
        cross_k(adf, bdf, radii=[], width=w, height=h)


def test_mutual_information_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import mutual_information
    random.seed(179)
    # a depends on b for half the rows -> MI strictly positive
    rows = []
    for _ in range(200):
        b = random.choice("xyz")
        a = ({"x": 0, "y": 1, "z": 2}[b] if random.random() < 0.5
             else random.randrange(4))
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a long, b string")
    (row,) = mutual_information(df).collect()
    from collections import Counter
    cab = Counter(rows)
    ca = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)

    def rnd(v):
        return (math.floor(v * 1e6 + 0.5) if v >= 0
                else -math.floor(-v * 1e6 + 0.5))

    mi = sum(rnd(c / n * math.log(c * n / (ca[a] * cb[b])))
             for (a, b), c in cab.items())

    def ent(cnt):
        s = sum(rnd(c * math.log(c)) for c in cnt.values())
        return rnd(math.log(n) - s / 1e6 / n)

    ha, hb = ent(ca), ent(cb)
    nmi = rnd(mi / min(ha, hb)) if min(ha, hb) > 0 else None
    assert (row.n, row.n_cells_ab, row.mi_micro, row.h_a_micro,
            row.h_b_micro, row.nmi_micro) \
        == (n, len(cab), mi, ha, hb, nmi)
    assert row.mi_micro > 50_000     # the planted dependence shows
    # independence sanity: constant b -> H_B = 0, NMI NULL
    df2 = spark.createDataFrame([(a, "only") for a, _ in rows],
                                "a long, b string")
    (r2,) = mutual_information(df2).collect()
    assert r2.h_b_micro == 0 and r2.nmi_micro is None


def test_cell_churn_brute_force(spark):
    import random
    from cdap_geo_spark.operators.zonal import cell_churn
    random.seed(181)
    rows = set()
    for _ in range(300):
        rows.add((random.randrange(3), random.randrange(3),
                  random.randrange(4, 9), random.randrange(12)))
    # a cell occupied at one period then dark -> pure loss row
    rows |= {(9, 9, 5, 100), (9, 9, 5, 101)}
    rows.add((0, 0, 4, 0))   # also fed as a DUPLICATE row below
    df = spark.createDataFrame(
        [(x, y, p, u) for x, y, p, u in rows]
        + [(0, 0, 4, 0)],               # duplicate presence collapses
        "qx long, qy long, p long, u long")
    got = {(r.qx, r.qy, r.p): (r.n_stay, r.n_gain, r.n_loss)
           for r in cell_churn(df).collect()}
    pmin = min(p for _, _, p, _ in rows)
    pmax = max(p for _, _, p, _ in rows)
    cells = {(x, y) for x, y, _, _ in rows}
    want = {}
    for (x, y) in cells:
        for p in range(pmin, pmax):
            cur = {u for xx, yy, pp, u in rows
                   if (xx, yy, pp) == (x, y, p)}
            nxt = {u for xx, yy, pp, u in rows
                   if (xx, yy, pp) == (x, y, p + 1)}
            if not cur and not nxt:
                continue
            stay = len(cur & nxt)
            want[(x, y, p)] = (stay, len(nxt) - stay,
                               len(cur) - stay)
    assert got == want
    # the dark cell reports its loss with zero stay/gain
    assert got[(9, 9, 5)] == (0, 0, 2)
    # conservation per cell: sum(gain) - sum(loss) = last - first count
    for (x, y) in cells:
        gains = sum(v[1] for (xx, yy, _), v in got.items()
                    if (xx, yy) == (x, y))
        losses = sum(v[2] for (xx, yy, _), v in got.items()
                     if (xx, yy) == (x, y))
        first = len({u for xx, yy, pp, u in rows
                     if (xx, yy, pp) == (x, y, pmin)})
        last = len({u for xx, yy, pp, u in rows
                    if (xx, yy, pp) == (x, y, pmax)})
        assert gains - losses == last - first


def test_idw_loocv_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import idw_loocv
    random.seed(191)
    side, r = 400, 80
    pts = [(i, random.randrange(side), random.randrange(side),
            random.randrange(1, 100)) for i in range(60)]
    pts.append((999, 5000, 5000, 50))          # censored isolate
    df = spark.createDataFrame(pts, "id long, x long, y long, z long")
    (row,) = idw_loocv(df, radius=r).collect()

    def rnd(v):
        return (math.floor(v * 1e6 + 0.5) if v >= 0
                else -math.floor(-v * 1e6 + 0.5))

    errs, abss = [], []
    for i, x, y, z in pts:
        sn = sd = 0
        for j, bx, by, bz in pts:
            if i == j:
                continue
            d2 = (x - bx) ** 2 + (y - by) ** 2
            if d2 > r * r:
                continue
            sn += rnd(bz / (d2 + 1))
            sd += rnd(1 / (d2 + 1))
        if sd > 0:
            e = sn / sd - z
            errs.append(rnd(e))
            abss.append(rnd(abs(e)))
    n = len(pts)
    assert (row.n, row.n_scored, row.n_censored) \
        == (n, len(errs), n - len(errs))
    assert row.n_censored == 1
    assert row.mae_micro == rnd(sum(abss) / len(abss) / 1e6)
    assert row.bias_micro == rnd(sum(errs) / len(errs) / 1e6)
    import pytest as _pt
    with _pt.raises(ValueError):
        idw_loocv(df, radius=0)


def test_spatial_entropy_query_brute_force(spark):
    import math
    import __spark_entry__ as E
    got = {r.g: (r.n, r.k_cells, r.h_micro, r.evenness_micro)
           for r in E._q_spatial_entropy(
               spark, "/root/testdata/sf0.001").collect()}
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet") \
        .to_pydict()
    from collections import Counter, defaultdict
    per = defaultdict(Counter)
    for eid, et in zip(t["event_id"], t["event_type"]):
        if et is None:
            continue
        cell = ((eid * 48271 + 17) % 700000 // 20000 * 65
                + (eid * 69621 + 29) % 1300000 // 20000)
        per[et][cell] += 1

    def rnd(v):
        return (math.floor(v * 1e6 + 0.5) if v >= 0
                else -math.floor(-v * 1e6 + 0.5))

    for g, cnt in per.items():
        n = sum(cnt.values())
        k = len(cnt)
        s = sum(rnd(c * math.log(c)) for c in cnt.values())
        h = rnd(math.log(n) - s / 1e6 / n)
        evn = rnd(h / (math.log(k) * 1e6)) if k > 1 else None
        assert got[g] == (n, k, h, evn), g
        # entropy is bounded by ln k; evenness in [0, 1] + slack
        assert 0 <= h <= rnd(math.log(k)) + 1
        if evn is not None:
            assert 0 <= evn <= 1_000_001


def test_variogram_directional_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import variogram_directional
    random.seed(193)
    n, side = 90, 700
    pts = [(i, random.randrange(side), random.randrange(side),
            random.randrange(60)) for i in range(n)]
    df = spark.createDataFrame(pts, "id long, x long, y long, z long")
    h_max, n_bins = 300, 6
    width = h_max // n_bins
    got = {(r.sector, r.bin): (r.lo, r.hi, r.n_pairs, r.gamma_micro)
           for r in variogram_directional(
               df, h_max=h_max, n_bins=n_bins).collect()}
    acc = {}
    for i, ax, ay, az in pts:
        for j, bx, by, bz in pts:
            if i >= j:
                continue
            dx, dy = ax - bx, ay - by
            d2 = dx * dx + dy * dy
            if d2 >= h_max * h_max:
                continue
            if dy < 0 or (dy == 0 and dx < 0):
                dx, dy = -dx, -dy
            if 2 * abs(dy) <= abs(dx):
                sec = "EW"
            elif 2 * abs(dx) <= abs(dy):
                sec = "NS"
            else:
                sec = "NE" if dx > 0 else "NW"
            b = math.isqrt(d2) // width
            c, s = acc.get((sec, b), (0, 0))
            acc[(sec, b)] = (c + 1, s + (az - bz) ** 2)
    want = {k: (k[1] * width, (k[1] + 1) * width, c,
                math.floor(s / (2 * c) * 1e6 + 0.5))
            for k, (c, s) in acc.items()}
    assert got == want
    # all four sectors appear on an isotropic cloud
    assert {k[0] for k in got} == {"EW", "NS", "NE", "NW"}


def test_bivariate_morans_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.zonal import bivariate_morans
    random.seed(197)
    n = 25
    vals = [(i, random.randrange(100), random.randrange(80))
            for i in range(n)]
    edges = []
    for i in range(n):
        edges += [(i, (i + 1) % n), ((i + 1) % n, i)]
    vdf = spark.createDataFrame(vals, "id long, x long, y2 long")
    edf = spark.createDataFrame(edges, "a long, b long")
    (row,) = bivariate_morans(vdf, edf).collect()
    sx = sum(x for _, x, _ in vals)
    sy = sum(y for _, _, y in vals)
    zx = {i: x - sx // n for i, x, _ in vals}
    zy = {i: y - sy // n for i, _, y in vals}
    num = sum(zx[a] * zy[b] for a, b in edges)
    dx = sum(v * v for v in zx.values())
    dy = sum(v * v for v in zy.values())
    w = len(edges)
    want = n * num / (w * math.sqrt(dx) * math.sqrt(dy))
    want_m = (math.floor(want * 1e6 + 0.5) if want >= 0
              else -math.floor(-want * 1e6 + 0.5))
    assert (row.n, row.w_pairs, row.num, row.den_x, row.den_y) \
        == (n, w, num, dx, dy)
    assert row.i_micro == want_m
    # x == y2 must reduce to the univariate morans_i statistic
    from cdap_geo_spark.operators.zonal import morans_i
    same = spark.createDataFrame([(i, x, x) for i, x, _ in vals],
                                 "id long, x long, y2 long")
    (bv,) = bivariate_morans(same, edf).collect()
    (uv,) = morans_i(same.selectExpr("id", "x"), edf).collect()
    assert abs(bv.i_micro - uv.i_micro) <= 1


def test_smr_query_brute_force(spark):
    import math
    import __spark_entry__ as E
    got = {(r.qx, r.qy): (r.n_events, r.n_cases, r.expected_micro,
                          r.smr_micro)
           for r in E._q_smr(spark, "/root/testdata/sf0.001").collect()}
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet") \
        .to_pydict()
    from collections import defaultdict
    cell = defaultdict(lambda: [0, 0])
    for eid, et in zip(t["event_id"], t["event_type"]):
        if et is None:
            continue
        k = ((eid * 48271 + 17) % 700000 // 100000,
             (eid * 69621 + 29) % 1300000 // 100000)
        cell[k][0] += 1
        cell[k][1] += (et == "error")
    n = sum(v[0] for v in cell.values())
    c = sum(v[1] for v in cell.values())
    for k, (ne, nc) in cell.items():
        e = math.floor(ne * c * 1e6 / n + 0.5)
        smr = (math.floor(nc * n * 1e6 / (ne * c) + 0.5)
               if ne > 0 and c > 0 else None)
        assert got[k] == (ne, nc, e, smr), k
    # conservation: expected cases sum back to the observed total
    # (within per-cell rounding slack)
    assert abs(sum(v[2] for v in got.values()) - c * 1_000_000) \
        <= len(got) * 1
