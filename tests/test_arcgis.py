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
    # reference enumeration: range(1, count, batch), half-open pages
    assert len(paths) == 3
    assert "objectIds=1,2" in paths[0] and paths[0].endswith("f=json")
    ids = []
    for p in paths:
        ids += [int(x) for x in
                p.split("objectIds=")[1].split("&")[0].split(",")]
    assert ids == sorted(set(ids))  # no overlap, ordered
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
