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
