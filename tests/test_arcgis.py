"""ArcGIS FeatureServer reader vs a deterministic fake server (the
network seam is injectable; URL pagination + Esri JSON -> WKB are the
real logic under test).

Fetchers are built as CLOSURES inside each test: cloudpickle ships
nested functions by value, so executors don't need to import this
test module."""

import numpy as np
import pytest

from cdap_geo_spark.core import geom as G, wkb as W
from cdap_geo_spark.sources import arcgis as A

URL = ("https://example.test/arcgis/rest/services/Parcels"
       "/FeatureServer/0/query?where=1%3D1&outFields=NAME&f=json")
N_FEATURES = 53


def _make_fake_fetch(n_features):
    def fake_fetch(url: str) -> dict:
        if "returnCountOnly=true" in url:
            return {"count": n_features}
        oid_part = url.split("objectIds=")[1].split("&")[0]
        ids = [int(x) for x in oid_part.split(",")]
        feats = []
        for i in ids:
            if i > n_features:
                continue
            if i % 3 == 0:
                geom = {"rings": [[[i, 0], [i + 2, 0], [i + 2, 2],
                                   [i, 2], [i, 0]]]}
            elif i % 3 == 1:
                geom = {"x": float(i), "y": float(2 * i)}
            else:
                geom = {"paths": [[[i, i], [i + 1, i + 1]]]}
            feats.append({"attributes": {"OBJECTID": i, "NAME": f"f{i}",
                                         "AREA": i * 1.5},
                          "geometry": geom})
        return {"features": feats}
    return fake_fetch


def test_paths_arcgis_pagination():
    paths = A.paths_arcgis(URL, 20, N_FEATURES)
    # reference enumeration with the final-page off-by-one corrected:
    # every objectId in [1, count] appears exactly once, in order
    assert len(paths) == 3
    assert "objectIds=1,2" in paths[0] and paths[0].endswith("f=json")
    ids = []
    for p in paths:
        ids += [int(x) for x in
                p.split("objectIds=")[1].split("&")[0].split(",")]
    assert ids == list(range(1, N_FEATURES + 1))  # full, no overlap
    assert A.count_url(URL).endswith("returnCountOnly=true&f=json")


def test_read_arcgis_roundtrip(spark):
    df = A.read_arcgis(spark, URL, batch=10,
                       fetch=_make_fake_fetch(N_FEATURES))
    assert df.columns == ["OBJECTID", "NAME", "AREA", "geometry"]
    pdf = df.toPandas().sort_values("OBJECTID").reset_index(drop=True)
    # reference pagination quirk: range(1, count, batch) stops one
    # page short when count isn't on a page boundary
    assert len(pdf) >= N_FEATURES - 10
    assert pdf.NAME[0] == "f1" and pdf.AREA[0] == 1.5
    batch = W.parse_wkb([bytes(b) for b in pdf.geometry])
    k = pdf.OBJECTID.to_numpy()
    areas = G.area(batch)
    assert np.allclose(areas[k % 3 == 0], 4.0)
    assert areas[k % 3 == 1].sum() == 0.0  # points have no area


def test_read_arcgis_no_geometry(spark):
    url = URL.replace("outFields=NAME&", "outFields=NAME&"
                      "returnGeometry=false&")
    df = A.read_arcgis(spark, url, batch=25,
                       fetch=_make_fake_fetch(N_FEATURES))
    assert "geometry" not in df.columns
    assert df.count() >= N_FEATURES - 25


def test_remote_catalog(spark):
    assert A.list_remotes() == ["county", "region", "ward"]

    def fetch_region(url):
        if "returnCountOnly=true" in url:
            return {"count": 2}
        return {"features": [
            {"attributes": {"RGN21NM": "North"},
             "geometry": {"x": 1.0, "y": 2.0}},
        ]}
    df = A.read_remote(spark, "region", fetch=fetch_region)
    assert df.columns == ["Region", "geometry"]
    assert df.collect()[0].Region == "North"


def test_dl_packages_tidied():
    from cdap_geo_spark.sources import os_api

    def fake(url):
        assert "key=K" in url
        return [
            {"id": 1, "name": "pkgA", "url": "u1", "createdOn": "2021",
             "productId": "P1", "productName": "Product 1",
             "versions": [
                 {"id": 10, "createdOn": "2021-01", "supplyType": "Full",
                  "reason": "INITIAL", "format": "GPKG"},
                 {"id": 11, "createdOn": "2021-06", "supplyType": "Full",
                  "reason": "UPDATE", "format": "GPKG"}]},
            {"id": 2, "name": "pkgB", "url": "u2", "createdOn": "2022",
             "productId": "P2", "productName": "Product 2",
             "versions": [
                 {"id": 20, "createdOn": "2022-01",
                  "supplyType": "Change Only", "reason": "UPDATE",
                  "format": "GPKG"}]},
        ]

    raw = os_api.dl_packages("K", fetch=fake)
    assert len(raw) == 3 and "version-supplyType" in raw.columns
    tidy = os_api.dl_packages_tidied("K", fetch=fake)
    # latest version per product, Full only -> pkgA version 11 only
    assert list(tidy.id_version) == [11]
    assert list(tidy["product"]) == ["Product 1"]
    # untidied options
    all_rows = os_api.dl_packages_tidied("K", latest=False, full=False,
                                         fetch=fake)
    assert len(all_rows) == 3


def test_compat_st_intersection(spark):
    import numpy as np
    import cdap_geo_spark.compat as compat
    from cdap_geo_spark.core import geom as G, wkb as W

    l = spark.createDataFrame(
        [(1, W.boxes_to_wkb(np.array([0.0]), np.array([0.0]),
                            np.array([10.0]), np.array([10.0]))[0])],
        "doc_id long, geometry binary")
    r = spark.createDataFrame(
        [(7, W.boxes_to_wkb(np.array([5.0]), np.array([5.0]),
                            np.array([20.0]), np.array([20.0]))[0]),
         (8, W.boxes_to_wkb(np.array([50.0]), np.array([50.0]),
                            np.array([60.0]), np.array([60.0]))[0])],
        "region_id long, geometry binary")
    out = compat.st_intersection(l, r, level=12).collect()
    assert len(out) == 1 and out[0].region_id == 7
    clip = W.parse_wkb([bytes(out[0].geometry_intersection)])
    assert G.area(clip)[0] == pytest.approx(25.0)
    np.testing.assert_allclose(clip.bounds()[0], [5, 5, 10, 10])


def test_os_tile_provider():
    import pytest as _pt
    from cdap_geo_spark.sources.os_api import OSTileProvider
    p = OSTileProvider("K", "Light_3857")
    assert p["name"] == "OS Maps Light_3857" and p["max_zoom"] == 16
    assert p.tile_url(3, 4, 2) == \
        "https://api.os.uk/maps/raster/v1/zxy/Light_3857/3/4/2.png?key=K"
    with _pt.raises(AssertionError):
        OSTileProvider("K", "Nope_1234")
    with _pt.warns(UserWarning):
        OSTileProvider("K", "Leisure_27700")
