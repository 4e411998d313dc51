"""Reference-API compat layer tests — including bit-for-bit BNG ref
parity against a direct transcription of the reference's encoder."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdap_geo_spark import compat
from cdap_geo_spark.core import wkb as W

import oracle


# direct transcription of cdap_geo/_indexing.py:73-105 for the oracle
_LETTERS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"
_NUMBERS_LENGTH = {1: 5, 10: 4, 100: 3, 1_000: 2, 10_000: 1, 100_000: 0}


def _ref_coords_to_bng(eastings, northings, resolution):
    eastings_string = str(int(eastings)).rjust(6, "0")
    northings_string = str(int(northings)).rjust(6, "0")
    eastings_quotient = int(eastings_string[:-5])
    eastings_remainder = eastings_string[-5:]
    northings_quotient = int(northings_string[:-5])
    northings_remainder = northings_string[-5:]
    first_letter_index = (
        (19 - northings_quotient)
        - (19 - northings_quotient) % 5
        + (eastings_quotient + 10) // 5
    )
    second_letter_index = (19 - northings_quotient) * 5 % 25 \
        + eastings_quotient % 5
    letters = _LETTERS[first_letter_index] + _LETTERS[second_letter_index]
    length = _NUMBERS_LENGTH[resolution]
    return letters + eastings_remainder[:length] + northings_remainder[:length]


def test_bng_refs_bit_parity():
    rng = np.random.RandomState(1)
    e = rng.randint(0, 700_000, 300)
    n = rng.randint(0, 1_300_000, 300)
    for res in (1, 10, 100, 1000, 10000, 100000):
        got = compat.bng_refs(e.astype(float), n.astype(float), res)
        want = [_ref_coords_to_bng(a, b, res) for a, b in zip(e, n)]
        assert got == want, res


def test_bng_udf_point_and_straddle(spark):
    rows = [(1, W.point_to_wkb(530_500.0, 180_500.0)),   # interior
            (2, W.point_to_wkb(530_000.0, 180_500.0)),   # vertical edge
            (3, W.point_to_wkb(530_000.0, 180_000.0))]   # vertex
    df = spark.createDataFrame(rows, "id long, geometry binary")
    out = {r.id: sorted(r.b) for r in
           df.select("id", compat.bng("geometry", 1000).alias("b")).collect()}
    assert out[1] == [_ref_coords_to_bng(530_500, 180_500, 1000)]
    assert len(out[2]) == 2 and len(out[3]) == 4


def test_bng_udf_polygon_cover(spark):
    box = W.boxes_to_wkb(np.array([529_500.0]), np.array([179_500.0]),
                         np.array([531_500.0]), np.array([181_500.0]))[0]
    df = spark.createDataFrame([(1, box)], "id long, geometry binary")
    out = df.select(compat.bng("geometry", 1000).alias("b")).collect()[0].b
    # box [529500,531500] pads to [529499,531501] -> cells 529/530/531
    # per axis = 3x3 cover, all intersecting the box
    assert len(out) == 9
    assert _ref_coords_to_bng(530_000, 180_000, 1000) in out


def test_compat_functions_roundtrip(spark):
    b1 = W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                        np.array([10.0]), np.array([10.0]))[0]
    b2 = W.boxes_to_wkb(np.array([5.0]), np.array([5.0]),
                        np.array([15.0]), np.array([15.0]))[0]
    df = spark.createDataFrame([(b1, b2)], "g1 binary, g2 binary")
    row = df.select(
        compat.area("g1").alias("a"),
        compat.bounds("g1").alias("b"),
        compat.intersects("g1", "g2").alias("i"),
        compat.intersection_area("g1", "g2").alias("ia"),
        compat.intersection("g1", "g2").alias("ig"),
    ).collect()[0]
    assert row.a == pytest.approx(100.0)
    assert row.b == [0, 0, 10, 10]
    assert row.i is True
    assert row.ia == pytest.approx(25.0)
    assert oracle.area(oracle.parse(bytes(row.ig))) == pytest.approx(25.0)


def test_compat_join_matches_reference_contract(spark):
    # join() returns bbox-level candidates with suffixed geometry
    # (index_bbox.py:32-71); bbox_intersects filters exactly (:73-76)
    from cdap_geo_spark import fixtures, docs as D
    dd = D.with_geometry(fixtures.documents(spark, 80, partitions=2)) \
        .select("doc_id", "geometry").cache()
    rr = fixtures.regions(spark, 30).select(
        F.col("region_id"), "geometry").cache()
    j = compat.join(dd, rr)
    assert "geometry" in j.columns and "geometry_right" in j.columns
    exact = compat.bbox_intersects(dd, rr)
    assert exact.count() <= j.count()
    # exact matches the engine oracle path
    from cdap_geo_spark.operators.sjoin import sjoin_pairs
    want = sjoin_pairs(dd, rr, left_id="doc_id", right_id="region_id",
                       level=7).count()
    assert exact.count() == want


def test_compat_to_sdf_to_gdf(spark):
    import pandas as pd
    pdf = pd.DataFrame({"geometry": [W.point_to_wkb(1, 2)]})
    sdf = compat.to_sdf(pdf, spark)
    back = compat.to_gdf(sdf)
    assert bytes(back.geometry[0]) == W.point_to_wkb(1, 2)


def test_bng_contains_marked(spark):
    """how='contains' parity (cdap_geo/_indexing.py:290-346): the
    intersects cover with inside=True exactly for cells properly
    contained in the polygon."""
    box = W.boxes_to_wkb(np.array([529_500.0]), np.array([179_500.0]),
                         np.array([532_500.0]), np.array([182_500.0]))[0]
    df = spark.createDataFrame([(1, box)], "id long, geometry binary")
    out = df.select(compat.bng("geometry", 1000, "contains")
                    .alias("b")).collect()[0].b
    got = {(r.bng, r.inside) for r in out}
    # 4x4 cover; the 2x2 middle block (530/531 x 180/181 km) is
    # properly inside [529500..532500]^2
    assert len(got) == 16
    inside = {r for r, i in got if i}
    assert inside == {_ref_coords_to_bng(x, y, 1000)
                      for x in (530_000, 531_000)
                      for y in (180_000, 181_000)}


def test_bng_contains_rejects_points(spark):
    df = spark.createDataFrame(
        [(1, W.point_to_wkb(1000.0, 1000.0))], "id long, geometry binary")
    import pyspark
    with pytest.raises(Exception):
        df.select(compat.bng("geometry", 1000, "contains")).collect()


def test_bng_multigeom_bounding_box_per_part(spark):
    """'bounding box' on a multi covers the union of PER-PART bboxes,
    not the whole-geometry bbox (cdap_geo/_indexing.py:156-170)."""
    import cdap_geo_spark.core.wkb as W2
    p1 = W2.boxes_to_wkb(np.array([100.0]), np.array([100.0]),
                         np.array([400.0]), np.array([400.0]))[0]
    p2 = W2.boxes_to_wkb(np.array([5100.0]), np.array([5100.0]),
                         np.array([5400.0]), np.array([5400.0]))[0]
    mp = W2.multi_to_wkb(W2.KIND_MULTIPOLYGON, [p1, p2])
    df = spark.createDataFrame([(1, mp)], "id long, geometry binary")
    out = df.select(compat.bng("geometry", 1000, "bounding box")
                    .alias("b")).collect()[0].b
    # each part pads to one 1km cell (0-1km and 5-6km): the whole-bbox
    # cover would be 6x6=36 cells; per-part is exactly 2
    assert sorted(out) == sorted([_ref_coords_to_bng(0, 0, 1000),
                                  _ref_coords_to_bng(5000, 5000, 1000)])


def test_wkt_from_bng_roundtrip():
    rng = np.random.RandomState(3)
    for res in (1, 10, 100, 1000, 10000, 100000):
        e = rng.randint(0, 700_000, 20)
        n = rng.randint(0, 1_300_000, 20)
        refs = compat.bng_refs(e.astype(float), n.astype(float), res)
        for ref, ee, nn in zip(refs, e, n):
            wkt = compat.wkt_from_bng(ref)
            x, y = wkt.split("((")[1].split(",")[0].split()
            assert int(x) == ee // res * res
            assert int(y) == nn // res * res
    with pytest.raises(ValueError):
        compat.wkt_from_bng("TQ307")  # odd digit count


def test_geohash_known_vectors():
    # public test vector for the geohash algorithm
    assert compat.geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    # common prefix of a degenerate box is the full-precision hash
    assert compat.encode_box(10.40744, 57.64911, 10.40744, 57.64911,
                             precision=11) == "u4pruydqqvj"
    # a box spanning hemispheres shares no prefix
    assert compat.encode_box(-10.0, -10.0, 10.0, 10.0) == ""


def test_geohash_column(spark):
    df = spark.createDataFrame(
        [(1, W.point_to_wkb(10.40744, 57.64911))], "id long, g binary")
    out = df.select(compat.geohash("g").alias("gh")).collect()[0].gh
    assert out.startswith("u4pruydqqvj")


def test_bng_join_cell_cooccurrence(spark):
    """Round-1 ADVICE: bng_join must pair geometries sharing a cell
    even when their bboxes do NOT overlap (reference has no bbox
    filter in index_bng.py)."""
    l = spark.createDataFrame(
        [(1, W.point_to_wkb(100_100.0, 100_100.0))], "lid long, geometry binary")
    r = spark.createDataFrame(
        [(2, W.point_to_wkb(100_900.0, 100_900.0))], "rid long, geometry binary")
    out = compat.bng_join(l, r, 1000)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].lid == 1 and rows[0].rid == 2
    assert "geometry_right" in out.columns


def test_unpersist_registry(spark):
    compat.unpersist_all()
    l = spark.createDataFrame([(1, W.point_to_wkb(1.0, 1.0))],
                              "lid long, geometry binary")
    r = spark.createDataFrame([(2, W.point_to_wkb(1.0, 1.0))],
                              "rid long, geometry binary")
    for _ in range(6):
        compat.join(l, r).count()
    # registration never evicts (an eviction before the join
    # materializes could recompute monotonically_increasing_id
    # inconsistently across branches — round-3 ADVICE #2); release is
    # explicit via unpersist_all
    assert len(compat._PERSISTED) == 12
    compat.unpersist_all()
    assert not compat._PERSISTED


def test_write_geoparquet_footer_and_sidecar(spark, tmp_path):
    """geoparquetify splices the 'geo' key into the part-0 parquet
    FOOTER (the reference's pyarrow hack, write.py:14-79) and the
    dataset stays Spark-readable; bbox comes from the written data."""
    import json
    import os
    import numpy as np
    import pyarrow.parquet as pq
    import cdap_geo_spark.compat as compat
    from cdap_geo_spark.core import wkb as W

    blobs = W.points_to_wkb(np.array([10.0, 30.0]), np.array([5.0, 25.0]))
    df = spark.createDataFrame([(1, blobs[0]), (2, blobs[1])],
                               "id long, geometry binary")
    path = str(tmp_path / "gp")
    compat.write_geoparquet(df, path, crs=27700)
    part0 = next(os.path.join(path, f) for f in sorted(os.listdir(path))
                 if "part-00000" in f and f.endswith("-geo.parquet"))
    meta = pq.read_schema(part0).metadata
    geo = json.loads(meta[b"geo"])
    assert geo["primary_column"] == "geometry"
    col = geo["columns"]["geometry"]
    assert col["encoding"] == "WKB" and col["crs"] == 27700
    assert col["bbox"] == [10.0, 5.0, 30.0, 25.0]
    # sidecar mirrors the footer; Spark still reads the dataset
    side = json.load(open(os.path.join(path, "_geo_metadata.json")))
    assert side == geo
    assert spark.read.parquet(path).count() == 2


def test_gdf_intersects_and_intersection_shims(spark):
    # reference functions.py:43-47 driver-local parity over WKB frames
    import pandas as pd
    from cdap_geo_spark import compat
    from cdap_geo_spark.core import geom as G, wkb as W
    boxes = [W.polygon_to_wkb([[[i * 10, 0], [i * 10 + 8, 0],
                                [i * 10 + 8, 8], [i * 10, 8],
                                [i * 10, 0]]]) for i in range(5)]
    pdf = pd.DataFrame({"rid": range(5), "geometry": boxes})
    window = W.polygon_to_wkb([[[5, -1], [25, -1], [25, 9], [5, 9],
                                [5, -1]]])
    hit = compat.gdf_intersects(pdf, window)
    assert list(hit.rid) == [0, 1, 2]
    clip = compat.gdf_intersection(pdf, window)
    areas = G.area(W.parse_wkb([bytes(b) for b in clip.geometry]))
    assert areas == pytest.approx([3 * 8, 8 * 8, 5 * 8])


def test_st_explode_compat_keeps_payload(spark):
    # sedona.py:80-85 parity: pieces bounded by maxVerticies, payload
    # columns replicated, total area preserved
    from cdap_geo_spark.core import geom as G
    th = np.linspace(0, 2 * np.pi, 41)[:-1]
    r = np.where(np.arange(40) % 2 == 0, 100.0, 60.0)
    ext = np.c_[r * np.cos(th), r * np.sin(th)]
    wkb = W.polygon_to_wkb([np.vstack([ext, ext[:1]])])
    df = spark.createDataFrame([("a", 7, wkb)],
                               "name string, tag long, geometry binary")
    out = compat.st_explode(df, maxVerticies=12).toPandas()
    assert len(out) > 1
    assert set(out.name) == {"a"} and set(out.tag) == {7}
    pieces = W.parse_wkb([bytes(b) for b in out.geometry])
    assert int(G.vertex_counts(pieces).max()) <= 12
    orig = W.parse_wkb([wkb])
    assert np.isclose(G.area(pieces).sum(), G.area(orig)[0], rtol=1e-9)
    compat.unpersist_all()


def test_join_scope_releases_persists(spark):
    from cdap_geo_spark import fixtures, docs as D
    dd = D.with_geometry(fixtures.documents(spark, 40, partitions=2)) \
        .select("doc_id", "geometry")
    rr = fixtures.regions(spark, 10).select(F.col("region_id"), "geometry")
    compat.unpersist_all()
    base = len(compat._PERSISTED)
    with compat.join_scope():
        out = compat.join(dd, rr)
        assert out.count() >= 0
        assert len(compat._PERSISTED) > base
    assert len(compat._PERSISTED) == base


def test_utils_trio(tmp_path, capsys):
    from cdap_geo_spark.compat import get_size, nowarn, tictoc

    (tmp_path / "a.bin").write_bytes(b"x" * 100)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 23)
    assert get_size(str(tmp_path / "a.bin")) == 100
    assert get_size(str(tmp_path)) == 123

    import warnings

    @nowarn
    def noisy():
        warnings.warn("boo", RuntimeWarning)
        return 7

    with warnings.catch_warnings():
        warnings.simplefilter("error")      # unsuppressed warn raises
        assert noisy() == 7                 # nowarn shields it

    @tictoc
    def timed():
        return 42

    assert timed() == 42
    assert "timed:" in capsys.readouterr().out
