"""GeoJSON source/sink: dict->WKB->dict round-trips through the
engine codec, distributed NDJSON + FeatureCollection reads, and a
write->read cycle reproducing geometry WKB bit-for-bit."""

import json

from pyspark.sql import functions as F

from cdap_geo_spark.core import wkb as W
from cdap_geo_spark.sources.geojson import (geojson_geometry_to_wkb,
                                            read_geojson,
                                            wkb_to_geojson_geometry,
                                            write_geojson)

GEOMS = [
    {"type": "Point", "coordinates": [100.5, -2.25]},
    {"type": "LineString", "coordinates": [[0, 0], [10, 5], [20, 0]]},
    {"type": "Polygon", "coordinates": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]]]},
    {"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]]},
    {"type": "MultiLineString",
     "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [5, 0], [5, 5], [0, 0]]],
        [[[10, 10], [15, 10], [15, 15], [10, 10]]]]},
]


def _norm(geom):
    """Normalize coordinates to floats for comparison."""
    def conv(x):
        if isinstance(x, list):
            return [conv(v) for v in x]
        return float(x)
    out = {"type": geom["type"]}
    if "coordinates" in geom:
        out["coordinates"] = conv(geom["coordinates"])
    if "geometries" in geom:
        out["geometries"] = [_norm(g) for g in geom["geometries"]]
    return out


def test_geometry_roundtrip_all_types():
    for g in GEOMS:
        blob = geojson_geometry_to_wkb(g)
        assert blob is not None, g["type"]
        back = json.loads(wkb_to_geojson_geometry(blob))
        assert _norm(back) == _norm(g), g["type"]
        # and the WKB round-trips bit-for-bit through text
        blob2 = geojson_geometry_to_wkb(back)
        assert blob2 == blob, g["type"]


def test_geometry_collection_and_degenerates():
    gc = {"type": "GeometryCollection", "geometries": [GEOMS[0], GEOMS[1]]}
    blob = geojson_geometry_to_wkb(gc)
    back = json.loads(wkb_to_geojson_geometry(blob))
    assert back["type"] == "GeometryCollection"
    assert _norm(back["geometries"][0]) == _norm(GEOMS[0])
    assert geojson_geometry_to_wkb(None) is None
    assert geojson_geometry_to_wkb({}) is None
    assert geojson_geometry_to_wkb(
        {"type": "Polygon", "coordinates": []}) is None
    assert wkb_to_geojson_geometry(None) is None


def test_read_ndjson_and_collection(spark, tmp_path):
    feats = [{"type": "Feature", "id": i,
              "geometry": GEOMS[i % len(GEOMS)],
              "properties": {"name": f"f{i}", "rank": i}}
             for i in range(20)]
    nd = tmp_path / "nd"
    nd.mkdir()
    with open(nd / "part-0.json", "w") as fh:
        for f in feats[:10]:
            fh.write(json.dumps(f) + "\n")
    with open(nd / "part-1.json", "w") as fh:
        for f in feats[10:]:
            fh.write(json.dumps(f) + "\n")
    got = read_geojson(spark, str(nd)).toPandas()
    assert len(got) == 20
    assert set(got.feature_id) == {str(i) for i in range(20)}
    assert all(b is not None for b in got.geometry)
    assert json.loads(
        got[got.feature_id == "3"].properties.iloc[0])["name"] == "f3"

    fc = tmp_path / "fc"
    fc.mkdir()
    with open(fc / "a.geojson", "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats[:12]}, fh)
    with open(fc / "b.geojson", "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats[12:]}, fh)
    got2 = read_geojson(spark, str(fc)).toPandas()
    assert len(got2) == 20
    # same geometry bytes either way
    ga = {r.feature_id: bytes(r.geometry) for r in got.itertuples()}
    gb = {r.feature_id: bytes(r.geometry) for r in got2.itertuples()}
    assert ga == gb


def test_write_read_cycle_bit_exact(spark, tmp_path):
    from cdap_geo_spark import docs as D
    from cdap_geo_spark import fixtures
    docs = D.with_geometry(fixtures.documents(spark, 100, partitions=4)) \
        .select("doc_id", "geometry")
    regs = fixtures.regions(spark, 30).select(
        F.col("region_id").cast("string").alias("doc_id"), "geometry")
    src = docs.unionByName(regs)
    out = str(tmp_path / "out")
    write_geojson(src, out)
    back = read_geojson(spark, out, lines=True).toPandas()
    want = {r.doc_id: bytes(r.geometry) for r in src.toPandas().itertuples()}
    got = {json.loads(r.properties)["doc_id"]: bytes(r.geometry)
           for r in back.itertuples()}
    assert got == want
