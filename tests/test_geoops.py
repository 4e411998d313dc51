"""Secondary geometry operators + streaming windows tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.core import wkb as W

import oracle


def test_st_group_dissolve(spark):
    from cdap_geo_spark.operators.geoops import st_group
    b1 = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                        np.array([10.0]), np.array([10.0]))[0]
    b2 = W.boxes_to_wkb(np.array([20.0]), np.array([0.0]),
                        np.array([30.0]), np.array([10.0]))[0]
    b3 = W.boxes_to_wkb(np.array([50.0]), np.array([50.0]),
                        np.array([60.0]), np.array([70.0]))[0]
    df = spark.createDataFrame([("a", b1), ("a", b2), ("b", b3)],
                               "key string, geometry binary")
    out = {r.key: r for r in st_group(df, "key", level=12).collect()}
    assert out["a"].n_parts == 2
    assert out["a"].union_area == pytest.approx(200.0)
    g = oracle.parse(bytes(out["a"].geometry))
    assert g["type"] == "Multi" and len(g["parts"]) == 2
    assert out["b"].n_parts == 1
    assert oracle.area(oracle.parse(bytes(out["b"].geometry))) == 200.0
    assert len(out["a"].cells) >= 1


def test_unary_union_udf(spark):
    from cdap_geo_spark.operators.geoops import unary_union_udf
    pts = W.points_to_wkb(np.array([1.0, 2.0]), np.array([1.0, 2.0]))
    df = spark.createDataFrame([(1, [pts[0], pts[1]])],
                               "id long, geoms array<binary>")
    out = df.select(unary_union_udf()(F.col("geoms")).alias("u")).collect()
    g = oracle.parse(bytes(out[0].u))
    assert g["type"] == "Multi" and len(g["parts"]) == 2


def test_pointify_box_coverage(spark):
    from cdap_geo_spark.operators.geoops import st_pointify
    box = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                         np.array([10.0]), np.array([10.0]))[0]
    df = spark.createDataFrame([(1, box)], "id long, geometry binary")
    out = df.select(st_pointify(1.0)(F.col("geometry")).alias("p")).collect()[0].p
    # 10x10 grid of centres, all inside the box
    assert out["count"] == 100
    assert out["mean"] == pytest.approx(1.0)
    assert len(out["points"]) == 100
    # triangle: roughly half the grid
    tri = W.polygon_to_wkb([[[0, 0], [10, 0], [0, 10], [0, 0]]])
    df2 = spark.createDataFrame([(1, tri)], "id long, geometry binary")
    out2 = df2.select(st_pointify(1.0)(F.col("geometry")).alias("p")).collect()[0].p
    assert 0.4 < out2["mean"] < 0.6


def test_pointify_chunked_exactness(spark, monkeypatch):
    # tiny chunk bound must not change ANY output (count/mean/points)
    from cdap_geo_spark.operators import geoops
    tri = W.polygon_to_wkb([[[0, 0], [10, 0], [0, 10], [0, 0]]])
    df = spark.createDataFrame([(1, tri)], "id long, geometry binary")
    full = df.select(geoops.st_pointify(1.0)(F.col("geometry"))
                     .alias("p")).collect()[0].p
    monkeypatch.setattr(geoops, "POINTIFY_CHUNK_POINTS", 7)
    tiny = df.select(geoops.st_pointify(1.0)(F.col("geometry"))
                     .alias("p")).collect()[0].p
    assert tiny["count"] == full["count"]
    assert tiny["mean"] == pytest.approx(full["mean"])
    assert [bytes(b) for b in tiny["points"]] == \
           [bytes(b) for b in full["points"]]


def test_pointify_giant_bbox_memory_bounded():
    # a thin sliver whose bbox is 30,000 x 30,000 units at resolution
    # 10 = a 9M-point grid. Unchunked, the meshgrid alone is
    # 9M x 8 B x ~5 float64 arrays ~ 360 MB in one shot (the round-3
    # per-row OOM); chunked it must stay under a fixed 64 MB ceiling
    # while producing the same (few) inside points. tracemalloc sees
    # NumPy's allocations through the Python allocator domain.
    import tracemalloc

    import pandas as pd

    from cdap_geo_spark.operators import geoops
    tri = W.polygon_to_wkb(
        [[[0, 0], [30_000, 30_000], [0, 6], [0, 0]]])
    fn = geoops.st_pointify(10.0, as_struct=True)
    compute = fn.func  # the raw pandas function behind the UDF
    tracemalloc.start()
    out = compute(pd.Series([tri]))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    counts = out["count"] if isinstance(out, pd.DataFrame) else out[0]
    # sliver area = 30000*6/2 = 90,000 units^2 -> ~900 cells at res 10
    assert 0 < counts[0] <= 6000
    assert peak < 64 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_buffer_point_disc(spark):
    from cdap_geo_spark.operators.geoops import st_buffer
    from cdap_geo_spark.core import geom as G
    df = spark.createDataFrame([(1, W.point_to_wkb(100.0, 100.0))],
                               "id long, geometry binary")
    out = df.select(st_buffer(10.0, segments=64)(F.col("geometry"))
                    .alias("b")).collect()
    b = W.parse_wkb([bytes(out[0].b)])
    # 64-gon area converges to pi*r^2
    assert G.area(b)[0] == pytest.approx(np.pi * 100, rel=0.01)
    np.testing.assert_allclose(b.bounds()[0], [90, 90, 110, 110], atol=0.1)


def test_transform_roundtrip(spark):
    from cdap_geo_spark.operators.geoops import st_transform
    df = spark.createDataFrame([(1, W.point_to_wkb(-0.1276, 51.5072))],
                               "id long, geometry binary")
    merc = df.select(st_transform("EPSG:4326", "EPSG:3857")(F.col("geometry"))
                     .alias("g"))
    back = merc.select(st_transform("EPSG:3857", "EPSG:4326")(F.col("g"))
                       .alias("g"))
    b = W.parse_wkb([bytes(back.collect()[0].g)])
    np.testing.assert_allclose(b.coords[0], [-0.1276, 51.5072], atol=1e-9)
    m = W.parse_wkb([bytes(merc.collect()[0].g)])
    # London web-mercator: x = radians(lon)*R, y = R*ln(tan(pi/4+lat/2))
    wx = np.radians(-0.1276) * 6_378_137.0
    wy = 6_378_137.0 * np.log(np.tan(np.pi / 4 + np.radians(51.5072) / 2))
    np.testing.assert_allclose(m.coords[0], [wx, wy], atol=1e-6)


def test_st_dump_parts(spark):
    from cdap_geo_spark.operators.geoops import st_dump
    pts = W.points_to_wkb(np.array([1.0, 2.0, 3.0]), np.array([1.0, 2.0, 3.0]))
    mp = W.multi_to_wkb(W.KIND_MULTIPOINT, pts)
    df = spark.createDataFrame([("d1", mp), ("d2", pts[0])],
                               "doc_id string, geometry binary")
    out = st_dump(df).collect()
    got = sorted((r.doc_id, r.part_idx) for r in out)
    assert got == [("d1", 0), ("d1", 1), ("d1", 2), ("d2", 0)]


def test_subdivide_by_cells_bounded_units(spark):
    from cdap_geo_spark.operators.geoops import subdivide_by_cells
    big = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                         np.array([200_000.0]), np.array([200_000.0]))[0]
    df = spark.createDataFrame([("d1", big)], "doc_id string, geometry binary")
    out = subdivide_by_cells(df, level=7).collect()  # 32km cells
    assert len(out) >= 36  # ~7x7 cells
    assert len({r.cell_id for r in out}) == len(out)


def test_sort_key_prefix_property(spark):
    from cdap_geo_spark.operators.geoops import st_sort_key
    from cdap_geo_spark.core import cells as C
    rows = [(1, W.point_to_wkb(1000.0, 1000.0)),
            (2, W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                               np.array([500_000.0]),
                               np.array([500_000.0]))[0])]
    df = spark.createDataFrame(rows, "id long, geometry binary")
    out = {r.id: r.k for r in
           df.select("id", st_sort_key()(F.col("geometry")).alias("k"))
           .collect()}
    lv1, _, _ = C.decode(np.array([out[1]]))
    lv2, _, _ = C.decode(np.array([out[2]]))
    assert lv1[0] == 16          # tiny point → max level
    assert lv2[0] < lv1[0]       # big box → coarser containing cell


def test_gpb_header_parse(spark):
    import struct
    from cdap_geo_spark.operators.geoops import unpack_gpb_header
    env = struct.pack("<dddd", 1.0, 2.0, 3.0, 4.0)
    hdr = b"GP" + bytes([0, 0b00000010]) + struct.pack("<i", 27700) + env
    df = spark.createDataFrame([(1, hdr), (2, None)],
                               "id long, blob binary")
    out = {r.id: r.h for r in
           df.select("id", unpack_gpb_header()(F.col("blob")).alias("h"))
           .collect()}
    assert out[1]["magic"] == "GP" and out[1]["srs_id"] == 27700
    assert out[1]["envelope"] == [1.0, 2.0, 3.0, 4.0]
    assert out[2]["magic"] is None


def test_windowed_event_counts_batch(spark):
    from cdap_geo_spark.streaming.windows import windowed_event_counts
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()


def test_streaming_windows_match_batch(spark, tmp_path):
    from cdap_geo_spark.streaming.windows import (
        stream_from_directory, windowed_event_counts)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "in")
    ev.limit(2000).repartition(2).write.parquet(src)
    stream = stream_from_directory(spark, src, ev.schema)
    q = (windowed_event_counts(stream, watermark="2 hours")
         .writeStream.format("memory").queryName("winagg")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) from winagg").collect()[0][0]
    want = windowed_event_counts(ev.limit(2000)) \
        .agg(F.sum("n_events")).collect()[0][0]
    assert got == want


def test_sessionize(spark):
    import datetime as dt
    from cdap_geo_spark.streaming.windows import sessionize
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(minutes=10)),
            (1, t0 + dt.timedelta(hours=2)),
            (2, t0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, gap_minutes=30).collect()
    sess = {(r.user_id, r.ts): r.session_seq for r in out}
    assert sess[(1, t0)] == 1
    assert sess[(1, t0 + dt.timedelta(minutes=10))] == 1
    assert sess[(1, t0 + dt.timedelta(hours=2))] == 2
    assert sess[(2, t0)] == 1


def test_st_load_normalization_chain(spark):
    """The reference ingest chain (cdap_geo/sedona.py:39-67): ring
    closure + collinear-vertex drop (simplify 0) + 1 mm snap."""
    import numpy as np
    from cdap_geo_spark.core import geom as G, wkb as W
    from cdap_geo_spark.operators.geoops import st_load

    # unclosed ring, a collinear mid-edge vertex, and sub-mm noise
    ring = np.array([[0.0, 0.0], [5.0 + 4e-4, 0.0], [10.0, 0.0],
                     [10.0, 10.0 - 4e-4], [0.0, 10.0]])
    blob = W.polygon_to_wkb([ring])  # emitted UNclosed on purpose
    df = spark.createDataFrame([(1, blob)], "id long, g binary")
    out = df.select(st_load()( "g").alias("g2")).collect()[0].g2
    got = W.parse_wkb([bytes(out)])
    # closed, snapped to mm, collinear vertex dropped -> 4 corners + close
    pts = got.coords
    assert G.area(got)[0] == pytest.approx(100.0, abs=1e-6)
    assert len(pts) == 5
    assert np.all(pts == np.round(pts, 3))


def test_st_load_degenerate_ring_drops(spark):
    import numpy as np
    from cdap_geo_spark.core import wkb as W
    from cdap_geo_spark.operators.geoops import st_load

    # zero-area sliver (all points collinear after 1mm snap)
    ring = np.array([[0.0, 0.0], [10.0, 1e-5], [20.0, 2e-5], [0.0, 0.0]])
    df = spark.createDataFrame([(1, W.polygon_to_wkb([ring]))],
                               "id long, g binary")
    out = df.select(st_load()("g").alias("g2")).collect()[0].g2
    assert out is None


def test_st_load_reprojects(spark):
    import numpy as np
    from cdap_geo_spark.core import proj as P, wkb as W
    from cdap_geo_spark.operators.geoops import st_load

    lon, lat = -0.1246, 51.5007
    df = spark.createDataFrame([(1, W.point_to_wkb(lon, lat))],
                               "id long, g binary")
    out = df.select(st_load(precision=3, from_crs=4326, to_crs=27700)("g")
                    .alias("g2")).collect()[0].g2
    got = W.parse_wkb([bytes(out)])
    # reference order: PrecisionReduce runs BEFORE Transform
    # (cdap_geo/sedona.py:48-53), so the snap applies to the degrees
    E, N = P.wgs84_to_en(np.array([round(lat, 3)]),
                         np.array([round(lon, 3)]))
    assert got.coords[0, 0] == pytest.approx(E[0], abs=1e-6)
    assert got.coords[0, 1] == pytest.approx(N[0], abs=1e-6)


def test_merge_columns(spark):
    from cdap_geo_spark.io import merge_columns
    df = spark.createDataFrame(
        [(1, None, "x", [1, 2], None), (None, 2.5, "y", None, 7)],
        "`a-int64` long, `a-double` double, `b-string` string, "
        "`c-list<item: int64>` array<long>, `c-int64` long")
    out = merge_columns(df)
    assert set(out.columns) == {"a", "b", "c"}
    rows = {r.b: r for r in out.collect()}
    assert rows["x"].a == 1.0 and rows["x"].c == [1, 2]
    assert rows["y"].a == 2.5 and rows["y"].c == [7]


def test_subdivide_by_cells_matches_cover(spark):
    """Round-1 gap: subdivide_by_cells had no test. Each output row is
    one (geometry, covering-cell) work unit; the cell set must equal
    the exact intersects cover of the geometry."""
    import numpy as np
    from cdap_geo_spark import udfs
    from cdap_geo_spark.core import wkb as W
    from cdap_geo_spark.operators.geoops import subdivide_by_cells
    from pyspark.sql import functions as F

    box = W.boxes_to_wkb(np.array([100_000.0]), np.array([100_000.0]),
                         np.array([200_000.0]), np.array([200_000.0]))[0]
    df = spark.createDataFrame([(1, box)], "doc_id long, geometry binary")
    out = subdivide_by_cells(df, level=7).toPandas()
    want = df.select(F.explode(
        udfs.st_cells(7, how="intersects")(F.col("geometry")))
        .alias("c")).toPandas()
    assert sorted(out.cell_id) == sorted(want.c)
    assert (out.doc_id == 1).all()
    # every row carries the full geometry blob (the clip window pattern)
    assert all(bytes(b) == box for b in out.geometry)


def test_to_sdf_to_gdf_roundtrip(spark):
    import numpy as np
    import cdap_geo_spark.compat as compat
    from cdap_geo_spark.core import wkb as W

    blobs = [W.point_to_wkb(1.0, 2.0), W.point_to_wkb(3.0, 4.0)]
    sdf = compat.to_sdf(list(blobs), spark)
    assert sdf.columns == ["geometry"]
    back = compat.to_gdf(sdf)
    got = W.parse_wkb([bytes(v) for v in back.geometry])
    assert got.coords.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_st_group_constructive_overlap(spark):
    """Overlapping members dissolve to the true union: area counted
    ONCE (round-1 deviation removed — slab union kernel)."""
    from cdap_geo_spark.core import geom as G
    from cdap_geo_spark.operators.geoops import st_group
    b1 = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                        np.array([10.0]), np.array([10.0]))[0]
    b2 = W.boxes_to_wkb(np.array([5.0]), np.array([5.0]),
                        np.array([15.0]), np.array([15.0]))[0]
    df = spark.createDataFrame([("a", b1), ("a", b2)],
                               "key string, geometry binary")
    row = st_group(df, "key").collect()[0]
    assert row.union_area == pytest.approx(175.0)  # 100+100-25
    merged = W.parse_wkb([bytes(row.geometry)])
    assert G.area(merged)[0] == pytest.approx(175.0)
    np.testing.assert_allclose(merged.bounds()[0], [0, 0, 15, 15])


def test_buffer_square_and_line_exact(spark):
    """Minkowski dilation: area = A + perimeter*r + pi*r^2 (square),
    2*L*r + pi*r^2 (segment) up to the n-gon disc approximation."""
    from cdap_geo_spark.core import geom as G
    from cdap_geo_spark.operators.geoops import st_buffer
    sq = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                        np.array([2.0]), np.array([2.0]))[0]
    line = W.linestring_to_wkb(np.array([[0.0, 0.0], [10.0, 0.0]]))
    df = spark.createDataFrame([(1, sq), (2, line)],
                               "id long, geometry binary")
    out = {r.id: r.b for r in
           df.select("id", st_buffer(1.0, segments=64)(F.col("geometry"))
                     .alias("b")).collect()}
    b = W.parse_wkb([bytes(out[1]), bytes(out[2])])
    areas = G.area(b)
    assert areas[0] == pytest.approx(4 + 8 + np.pi, rel=0.005)
    assert areas[1] == pytest.approx(20 + np.pi, rel=0.005)
    with pytest.raises(ValueError):
        st_buffer(-1.0)


def test_buffer_polygon_with_hole(spark):
    """Hole erodes by r (vanishes when 2r >= hole width)."""
    from cdap_geo_spark.core import geom as G
    from cdap_geo_spark.operators.geoops import st_buffer
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    pw = W.polygon_to_wkb([outer, hole])
    df = spark.createDataFrame([(1, pw)], "id long, geometry binary")
    out = df.select(st_buffer(0.5, segments=64)(F.col("geometry"))
                    .alias("b")).collect()
    b = W.parse_wkb([bytes(out[0].b)])
    want = 100 + 40 * 0.5 + np.pi * 0.25 - 1.0  # hole erodes to 1x1
    assert G.area(b)[0] == pytest.approx(want, rel=0.005)


def test_make_valid_bowtie_and_miswound_hole(spark):
    from cdap_geo_spark.core import geom as G
    from cdap_geo_spark.operators.geoops import make_valid_udf
    bow = W.polygon_to_wkb([np.array([[0, 0], [2, 2], [2, 0], [0, 2],
                                      [0, 0]], float)])
    # hole ring wound the same way as the exterior: even-odd still
    # subtracts it (ring order, not winding, decides in WKB)
    holey = W.polygon_to_wkb([
        np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
        np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)])
    pt = W.point_to_wkb(7.0, 7.0)
    df = spark.createDataFrame([(1, bow), (2, holey), (3, pt), (4, None)],
                               "id long, geometry binary")
    out = {r.id: r.b for r in
           df.select("id", make_valid_udf()(F.col("geometry")).alias("b"))
           .collect()}
    assert G.area(W.parse_wkb([bytes(out[1])]))[0] == pytest.approx(2.0)
    assert G.area(W.parse_wkb([bytes(out[2])]))[0] == pytest.approx(12.0)
    assert bytes(out[3]) == pt  # non-polygon passes through
    assert out[4] is None


def test_st_subdivide_explode_vertex_bound_and_area(spark):
    # a 120-vertex star polygon with a square hole: every piece must
    # carry <= 32 vertices and the pieces must tile the original
    # exactly (disjoint interiors separated by bisection lines)
    from cdap_geo_spark.core import geom as G
    from cdap_geo_spark.operators.geoops import st_subdivide_explode
    th = np.linspace(0, 2 * np.pi, 121)[:-1]
    r = np.where(np.arange(120) % 2 == 0, 100.0, 60.0)
    ext = np.c_[r * np.cos(th), r * np.sin(th)]
    ext = np.vstack([ext, ext[:1]])
    hole = np.array([[-10, -10], [10, -10], [10, 10], [-10, 10], [-10, -10]],
                    float)
    wkb = W.polygon_to_wkb([ext, hole])
    df = spark.createDataFrame([("d1", wkb)], "doc_id string, geometry binary")
    out = st_subdivide_explode(df, max_vertices=32).toPandas()
    assert len(out) > 1
    pieces = W.parse_wkb([bytes(b) for b in out.geometry])
    assert int(G.vertex_counts(pieces).max()) <= 32
    orig = W.parse_wkb([wkb])
    assert np.isclose(G.area(pieces).sum(), G.area(orig)[0], rtol=1e-9)


def test_st_subdivide_small_geoms_pass_through(spark):
    from cdap_geo_spark.operators.geoops import st_subdivide_explode
    tri = W.polygon_to_wkb([[[0, 0], [10, 0], [0, 10], [0, 0]]])
    pt = W.point_to_wkb(3.0, 4.0)
    line = W.linestring_to_wkb(np.c_[np.arange(300.0), np.arange(300.0)])
    df = spark.createDataFrame(
        [("t", tri), ("p", pt), ("l", line), ("n", None)],
        "doc_id string, geometry binary")
    out = st_subdivide_explode(df, max_vertices=100).toPandas()
    assert set(out[out.doc_id == "t"].piece_idx) == {0}   # unchanged
    assert len(out[out.doc_id == "p"]) == 1
    assert len(out[out.doc_id == "l"]) >= 3               # 300-pt chain split
    assert len(out[out.doc_id == "n"]) == 0


def test_st_subdivide_sjoin_result_unchanged(spark):
    # subdividing the right side must not change the sjoin pair set
    from cdap_geo_spark.operators.geoops import st_subdivide_explode
    from cdap_geo_spark.operators.sjoin import sjoin_pairs
    rng = np.random.RandomState(7)
    th = np.linspace(0, 2 * np.pi, 41)[:-1]
    r = np.where(np.arange(40) % 2 == 0, 9000.0, 5000.0)
    ext = np.c_[r * np.cos(th) + 50_000, r * np.sin(th) + 50_000]
    poly = W.polygon_to_wkb([np.vstack([ext, ext[:1]])])
    regions = spark.createDataFrame([(1, poly)],
                                    "region_id long, geometry binary")
    pts = [(int(i), W.point_to_wkb(float(rng.uniform(35_000, 65_000)),
                                   float(rng.uniform(35_000, 65_000))))
           for i in range(200)]
    docs = spark.createDataFrame(pts, "doc_id long, geometry binary")
    base = {(x.doc_id, x.region_id)
            for x in sjoin_pairs(docs, regions, level=9).collect()}
    sub = st_subdivide_explode(regions, max_vertices=16, id_col="region_id")
    got = {(x.doc_id, x.region_id)
           for x in sjoin_pairs(docs, sub.select("region_id", "geometry"),
                                level=9).collect()}
    assert got == base


def test_geometry_flatten_and_length():
    from cdap_geo_spark.operators.geoops import (geometry_flatten,
                                                 geometry_length)
    # polygon with a hole: exterior ring + interior ring, like the
    # reference's exterior-then-interiors order
    poly = W.polygon_to_wkb([
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]],
    ])
    parts = list(geometry_flatten(poly))
    assert [k for k, _ in parts] == ["ring", "ring"]
    assert [len(c) for _, c in parts] == [5, 5]
    assert geometry_length(poly) == 10

    pt = W.point_to_wkb(3.0, 4.0)
    parts = list(geometry_flatten(pt))
    assert parts[0][0] == "point" and parts[0][1].tolist() == [[3.0, 4.0]]
    assert geometry_length(pt) == 1

    mp = W.multi_to_wkb(W.KIND_MULTIPOINT,
                        W.points_to_wkb(np.array([1.0, 2.0]),
                                        np.array([1.0, 2.0])))
    assert [k for k, _ in geometry_flatten(mp)] == ["point", "point"]
    assert geometry_length(mp) == 2


def test_distributed_to_geoparquet_roundtrip(spark, tmp_path):
    """Round-5 parity wrapper (reference write.py:128-158): many
    heterogeneous GeoJSON files -> one merged WKB-GeoParquet dataset;
    EVERY output file must carry its GeoParquet 'geo' footer (stamped
    in-task, not by a driver-side rewrite), and merge_columns folds
    the col-{type} split columns back."""
    import json
    import os

    import pyarrow.parquet as pq

    from cdap_geo_spark.io import distributed_to_geoparquet

    src = tmp_path / "src"
    src.mkdir()
    pt = {"type": "Point", "coordinates": [100.0, 200.0]}
    poly = {"type": "Polygon",
            "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 0]]]}
    files = [
        {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "a", "v": 1},
             "geometry": pt},
            {"type": "Feature", "properties": {"name": "b", "v": 2},
             "geometry": poly}]},
        # heterogeneous: v is a double here, plus an extra column
        {"type": "FeatureCollection", "features": [
            {"type": "Feature",
             "properties": {"name": "c", "v": 2.5, "extra": "x"},
             "geometry": pt}]},
    ]
    for i, fc in enumerate(files):
        (src / f"f{i}.geojson").write_text(json.dumps(fc))

    out_dir = str(tmp_path / "out")
    got = distributed_to_geoparquet(spark, str(src / "*.geojson"),
                                    out_dir)
    rows = {r["name"] for r in got.collect()}
    assert rows == {"a", "b", "c"}
    assert "geometry" in got.columns and "v" in got.columns
    # v merged to double across int64/double source schemas
    assert dict(got.dtypes)["v"] == "double"

    parts = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(parts) == 2
    for f in parts:
        meta = pq.read_schema(os.path.join(out_dir, f)).metadata
        geo = json.loads(meta[b"geo"])
        assert geo["primary_column"] == "geometry-binary"
        assert len(geo["columns"]["geometry-binary"]["bbox"]) == 4
