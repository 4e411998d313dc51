"""Kernel tests: WKB codec (no Spark).

Pin the decode contract from SURVEY.md §1: WKB in/out, 2D
normalization (``cdap_geo/sedona.py:44-45``), null-safety
(``cdap_geo/sedona.py:15-36``: malformed/NULL never raises).
"""

import struct

import numpy as np
import pytest

from cdap_geo_spark.core import geom as G, wkb as W

import oracle


def test_point_roundtrip():
    xs = np.array([0.0, 123.456, -700000.0])
    ys = np.array([1.0, 654.321, 1300000.0])
    blobs = W.points_to_wkb(xs, ys)
    b = W.parse_wkb(blobs)
    assert b.kinds.tolist() == [W.KIND_POINT] * 3
    np.testing.assert_allclose(b.bounds()[:, 0], xs)
    np.testing.assert_allclose(b.bounds()[:, 1], ys)
    # oracle agrees
    for blob, x, y in zip(blobs, xs, ys):
        g = oracle.parse(blob)
        assert g["type"] == "Point" and g["coords"] == (x, y)


def test_box_roundtrip():
    blobs = W.boxes_to_wkb(np.array([1.0]), np.array([2.0]),
                           np.array([11.0]), np.array([22.0]))
    b = W.parse_wkb(blobs)
    assert b.kinds[0] == W.KIND_POLYGON
    np.testing.assert_allclose(b.bounds()[0], [1, 2, 11, 22])
    assert oracle.area(oracle.parse(blobs[0])) == pytest.approx(200.0)
    assert G.area(b)[0] == pytest.approx(200.0)


def test_null_and_malformed_never_raise():
    blobs = [None, b"", b"\x01\x01\x00", b"garbage!!", W.point_to_wkb(5, 5)]
    b = W.parse_wkb(blobs)
    assert b.valid.tolist() == [False, False, False, False, True]
    assert len(b) == 5
    # bounds of invalid rows are NaN
    assert np.isnan(b.bounds()[0]).all()


def test_big_endian_point():
    blob = struct.pack(">BIdd", 0, 1, 10.0, 20.0)
    b = W.parse_wkb([blob])
    assert b.valid[0]
    np.testing.assert_allclose(b.bounds()[0], [10, 20, 10, 20])


def test_iso_z_and_ewkb_z_dropped():
    iso_z = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0)
    ewkb_z = struct.pack("<BIddd", 1, 0x80000001, 4.0, 5.0, 6.0)
    b = W.parse_wkb([iso_z, ewkb_z])
    np.testing.assert_allclose(b.bounds()[:, :2], [[1, 2], [4, 5]])


def test_ewkb_srid_skipped():
    blob = struct.pack("<BIIdd", 1, 0x20000001, 27700, 7.0, 8.0)
    b = W.parse_wkb([blob])
    np.testing.assert_allclose(b.bounds()[0], [7, 8, 7, 8])


def test_point_empty_nan():
    blob = struct.pack("<BIdd", 1, 1, float("nan"), float("nan"))
    b = W.parse_wkb([blob])
    assert not b.valid[0]


def test_multipolygon():
    b1 = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                        np.array([10.0]), np.array([10.0]))[0]
    b2 = W.boxes_to_wkb(np.array([20.0]), np.array([20.0]),
                        np.array([30.0]), np.array([30.0]))[0]
    mp = W.multi_to_wkb(W.KIND_MULTIPOLYGON, [b1, b2])
    b = W.parse_wkb([mp])
    assert b.kinds[0] == W.KIND_MULTIPOLYGON
    np.testing.assert_allclose(b.bounds()[0], [0, 0, 30, 30])
    assert G.area(b)[0] == pytest.approx(200.0)


def test_polygon_with_hole():
    ext = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]
    blob = W.polygon_to_wkb([ext, hole])
    b = W.parse_wkb([blob])
    assert G.area(b)[0] == pytest.approx(96.0)
    assert oracle.area(oracle.parse(blob)) == pytest.approx(96.0)


def test_fast_path_matches_general():
    xs = np.array([1.5, 2.5, 3.5])
    ys = np.array([4.5, 5.5, 6.5])
    blobs = W.points_to_wkb(xs, ys)
    fast = W.parse_wkb(blobs)                      # uniform → fast path
    mixed = W.parse_wkb(list(blobs) + [None])      # non-uniform → general
    np.testing.assert_allclose(fast.coords, mixed.coords[:3])
    assert fast.kinds.tolist() == mixed.kinds[:3].tolist()


def test_slice_batch():
    blobs = W.points_to_wkb(np.arange(5, dtype=float), np.arange(5, dtype=float))
    b = W.parse_wkb(blobs)
    s = W.slice_batch(b, np.array([3, 1]))
    np.testing.assert_allclose(s.coords, [[3, 3], [1, 1]])
