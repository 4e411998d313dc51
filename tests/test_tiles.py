"""Operator tests: tile frame + tile assignment parity.

``split_grid`` boxes must match the reference's enumeration
(``cdap_geo/misc.py:6-17``: x-major then y, equal boxes); the
fixed-grid cover in 'reference' compat mode must reproduce
``bbox_index`` (``cdap_geo/index_bbox.py:15-30``) bit-for-bit.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdap_geo_spark import docs as D, fixtures, udfs
from cdap_geo_spark.core import wkb as W
from cdap_geo_spark.operators.tiles import assign_tiles, grid_cover_udf, split_grid

import oracle


def _reference_split_grid(bbox, splits):
    """Direct transcription of cdap_geo/misc.py:6-17 (minus shapely)."""
    x0, y0, x1, y1 = bbox
    dx, dy = (x1 - x0) / splits, (y1 - y0) / splits
    X = np.arange(x0, x1 + dx, dx)
    Y = np.arange(y0, y1 + dy, dy)
    return [
        (xmin, ymin, xmax, ymax)
        for (xmin, xmax) in zip(X[:-1], X[1:])
        for (ymin, ymax) in zip(Y[:-1], Y[1:])
    ]


def _reference_bbox_index(minx, miny, maxx, maxy, resolutions, limits):
    """Direct transcription of cdap_geo/index_bbox.py:15-30."""
    indexes = []
    for x in range(limits[0], limits[2], resolutions[0]):
        for y in range(limits[1], limits[3], resolutions[1]):
            if minx < x < maxx + resolutions[0] and miny < y < maxy + resolutions[1]:
                indexes.append(f"{x}-{y}")
    return indexes


def test_split_grid_matches_reference_enumeration(spark):
    bbox = (0.0, 0.0, 4000.0, 4000.0)
    got = split_grid(spark, bbox, 4).orderBy("tile_id").collect()
    want = _reference_split_grid(bbox, 4)
    got_boxes = sorted((r.minx, r.miny, r.maxx, r.maxy) for r in got)
    assert got_boxes == sorted(want)
    assert len(got) == 16
    # enumeration order (pre-sort) is x-major then y
    raw = split_grid(spark, bbox, 4).collect()
    assert [(r.minx, r.miny) for r in raw[:5]] == \
        [(0, 0), (0, 1000), (0, 2000), (0, 3000), (1000, 0)]
    # tile geometry is the box polygon
    g = oracle.parse(bytes(raw[0].geometry))
    assert oracle.area(g) == pytest.approx(1000.0 * 1000.0)


def test_grid_cover_reference_compat(spark):
    # random bboxes; engine O(covered) enumeration == reference O(grid) scan
    rng = np.random.RandomState(5)
    res = [100_000, 100_000]
    lim = [-500_000, -500_000, 1_500_000, 1_500_000]
    rows = []
    for _ in range(50):
        x0, y0 = rng.uniform(-400000, 1300000), rng.uniform(-400000, 1300000)
        rows.append((float(x0), float(y0),
                     float(x0 + rng.uniform(0, 300000)),
                     float(y0 + rng.uniform(0, 300000))))
    # grid-aligned edge cases
    rows += [(0.0, 0.0, 100000.0, 100000.0), (100000.0, 0.0, 100000.0, 0.0)]
    df = spark.createDataFrame(rows, "minx double, miny double, maxx double, maxy double")
    cov = grid_cover_udf(res, lim, compat="reference")
    got = df.select(cov("minx", "miny", "maxx", "maxy").alias("c")).collect()
    for row, g in zip(rows, got):
        want = _reference_bbox_index(*row, res, lim)
        assert sorted(g["c"]) == sorted(want), row


def test_assign_tiles_matches_box_oracle(spark):
    dd = fixtures.documents(spark, 200, partitions=2)
    dg = D.with_geometry(dd).cache()
    bbox = (0, 0, 700_000, 1_300_000)
    splits = 10  # 70km x 130km tiles
    got = set(map(tuple, assign_tiles(dg, bbox=bbox, splits=splits).collect()))
    # oracle: direct box-containment in pandas (FIXTURES.md oracle §1×§3)
    docs_pd = dg.select("doc_id", "geometry").toPandas()
    tiles = _reference_split_grid(bbox, splits)
    want = set()
    for i, blob in enumerate(docs_pd.geometry):
        g = oracle.parse(bytes(blob))
        for (mnx, mny, mxx, mxy) in tiles:
            tile = {"type": "Polygon", "rings": [[
                (mnx, mny), (mxx, mny), (mxx, mxy), (mnx, mxy), (mnx, mny)]]}
            if oracle.intersects(g, tile):
                want.add((docs_pd.doc_id[i], f"{int(mnx)}-{int(mny)}"))
    assert got == want


def test_assign_tiles_point_single_tile(spark):
    pts = spark.createDataFrame([("a", 5.0, 5.0), ("b", 1999.0, 1.0)],
                                "doc_id string, x double, y double")
    pts = pts.select("doc_id", udfs.st_point()(F.col("x"), F.col("y"))
                     .alias("geometry"))
    got = set(map(tuple, assign_tiles(pts, bbox=(0, 0, 2000, 2000),
                                      splits=2).collect()))
    assert got == {("a", "0-0"), ("b", "1000-0")}


def test_tile_rollup_matches_bruteforce(spark):
    import numpy as np
    from cdap_geo_spark.operators.tiles import tile_rollup
    rng = np.random.RandomState(11)
    xs = rng.uniform(0, 2000, 400)
    ys = rng.uniform(0, 2000, 400)
    pts = spark.createDataFrame(
        [(int(i), float(xs[i]), float(ys[i])) for i in range(400)],
        "doc_id long, x double, y double").select(
        "doc_id", udfs.st_point()(F.col("x"), F.col("y")).alias("geometry"))
    assigned = assign_tiles(pts, bbox=(0, 0, 2000, 2000), splits=8)
    got = tile_rollup(assigned, resolutions=(250, 250), factor=2) \
        .toPandas().set_index("parent_tile_id").sort_index()
    fine = {}
    for x, y in zip(xs, ys):
        fine.setdefault((int(x // 250) * 250, int(y // 250) * 250), 0)
        fine[(int(x // 250) * 250, int(y // 250) * 250)] += 1
    want = {}
    for (fx, fy), n in fine.items():
        key = f"{fx // 500 * 500}-{fy // 500 * 500}"
        tot, cnt, mx = want.get(key, (0, 0, 0))
        want[key] = (tot + n, cnt + 1, max(mx, n))
    assert set(got.index) == set(want)
    for key, (tot, cnt, mx) in want.items():
        assert got.loc[key, "n_rows"] == tot
        assert got.loc[key, "n_child_tiles"] == cnt
        assert got.loc[key, "max_child_rows"] == mx


def test_tile_rollup_negative_origins_and_precounted(spark):
    from cdap_geo_spark.operators.tiles import tile_rollup
    # ids with negative origins parse unambiguously ('-100-200')
    rows = [(1, "-100-200"), (2, "-100-200"), (3, "-200--100"),
            (4, "0-0"), (5, "100--100")]
    df = spark.createDataFrame(rows, "doc_id long, tile_id string")
    got = {r.parent_tile_id: (r.n_rows, r.n_child_tiles, r.max_child_rows)
           for r in tile_rollup(df, resolutions=(100, 100),
                                factor=2).collect()}
    assert got == {"-200-200": (2, 1, 2),      # x=-100 -> parent -200
                   "-200--200": (1, 1, 1),     # (-200,-100) -> (-200,-200)
                   "0-0": (1, 1, 1),
                   "0--200": (1, 1, 1)}        # (100,-100) -> (0,-200)
    # pre-aggregated count relation rolls up identically
    pre = df.groupBy("tile_id").count()
    got2 = {r.parent_tile_id: (r.n_rows, r.n_child_tiles, r.max_child_rows)
            for r in tile_rollup(pre, resolutions=(100, 100), factor=2,
                                 count_col="count").collect()}
    assert got2 == got


def test_tile_pyramid_level1_equals_rollup_and_bruteforce(spark):
    from cdap_geo_spark.operators.tiles import tile_pyramid, tile_rollup
    import random
    rng = random.Random(41)
    # tiles at resolution (10, 10), including negative origins
    rows = [(i, f"{rng.randrange(-5, 5) * 10}-{rng.randrange(-5, 5) * 10}")
            for i in range(300)]
    df = spark.createDataFrame(rows, "row_id long, tile_id string")
    pyr = tile_pyramid(df, resolutions=(10, 10), factor=2, levels=2)
    got = {(r.level, r.tile_id): (r.n_rows, r.n_child_tiles,
                                  r.max_child_rows)
           for r in pyr.collect()}

    # level 1 must equal a direct tile_rollup of the raw assignment
    direct = {("L1", r.parent_tile_id): (r.n_rows, r.n_child_tiles,
                                         r.max_child_rows)
              for r in tile_rollup(df, resolutions=(10, 10),
                                   factor=2).collect()}
    assert {k[1]: v for k, v in got.items() if k[0] == 1} == \
           {k[1]: v for k, v in direct.items()}

    # brute force both levels
    import collections
    fine = collections.Counter(t for _, t in rows)

    def parent(tid, res):
        import re
        m = re.match(r"^(-?\d+)-(-?\d+)$", tid)
        px = (int(m.group(1)) // res) * res
        py = (int(m.group(2)) // res) * res
        return f"{px}-{py}"

    for lvl, res in ((1, 20), (2, 40)):
        if lvl == 1:
            groups = collections.defaultdict(list)
            for t, n in fine.items():
                groups[parent(t, 20)].append(n)
            l1 = {t: (sum(v), len(v), max(v)) for t, v in groups.items()}
            assert {k[1]: v for k, v in got.items() if k[0] == 1} == l1
        else:
            groups = collections.defaultdict(list)
            for t, (n, _, _) in l1.items():
                groups[parent(t, 40)].append(n)
            l2 = {t: (sum(v), len(v), max(v)) for t, v in groups.items()}
            assert {k[1]: v for k, v in got.items() if k[0] == 2} == l2


def test_tile_pyramid_validates_levels(spark):
    import pytest
    from cdap_geo_spark.operators.tiles import tile_pyramid
    df = spark.createDataFrame([(1, "0-0")], "row_id long, tile_id string")
    with pytest.raises(ValueError):
        tile_pyramid(df, resolutions=(10, 10), factor=2, levels=0)


def test_adaptive_tiles_brute_force_and_invariants(spark):
    import random
    from cdap_geo_spark.operators.tiles import adaptive_tiles
    random.seed(47)
    # skewed cloud: hot blob + sparse background
    pts = [(random.randrange(5000), random.randrange(5000))
           for _ in range(900)]
    pts += [(random.randrange(1 << 21), random.randrange(1 << 21))
            for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    k, lo, hi, wb = 100, 5, 9, 21
    got = {(r.level, r.tx, r.ty): r.n
           for r in adaptive_tiles(df, max_per_tile=k, min_level=lo,
                                   max_level=hi,
                                   world_bits=wb).collect()}

    from collections import Counter
    fin = Counter(((x >> (wb - hi), y >> (wb - hi)) for x, y in pts))
    anc = {lvl: Counter() for lvl in range(lo, hi)}
    for (tx, ty), n in fin.items():
        for lvl in range(lo, hi):
            d = hi - lvl
            anc[lvl][(tx >> d, ty >> d)] += n
    want = Counter()
    for (tx, ty), n in fin.items():
        leaf = hi
        for lvl in range(lo, hi):
            d = hi - lvl
            if anc[lvl][(tx >> d, ty >> d)] <= k:
                leaf = lvl
                break
        d = hi - leaf
        want[(leaf, tx >> d, ty >> d)] += n
    assert got == dict(want)
    # invariants: conservation; bound respected above max_level;
    # the skew actually forced deep splits AND kept coarse tiles
    assert sum(got.values()) == len(pts)
    assert all(n <= k for (lvl, _, _), n in got.items() if lvl < hi)
    assert any(lvl == hi for lvl, _, _ in got)   # hot blob hit the floor
    assert any(lvl == lo for lvl, _, _ in got)   # sparse areas stayed coarse
    # disjointness: no leaf is an ancestor of another leaf
    leaves = list(got)
    anc_set = set()
    for lvl, tx, ty in leaves:
        for up in range(lo, lvl):
            anc_set.add((up, tx >> (lvl - up), ty >> (lvl - up)))
    assert not (set(leaves) & anc_set)


def test_adaptive_tiles_validates(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.tiles import adaptive_tiles
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with _pt.raises(ValueError):
        adaptive_tiles(df, max_per_tile=0)
    with _pt.raises(ValueError):
        adaptive_tiles(df, max_per_tile=5, min_level=10, max_level=9)
