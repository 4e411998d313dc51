"""Distributed ArcGIS FeatureServer reader — paged fetch, Esri JSON
-> WKB, network behind an injectable fetcher.

The reference (``cdap_geo/remotes.py:9-46``) splits a FeatureServer
query URL into objectId-range pages, fetches the count, then reads
each page in parallel with ``groupBy('path').applyInPandas`` over
geopandas ``read_file``. Same plan here, Spark-first and
sandbox-honest:

* ``paths_arcgis`` reproduces the reference's URL pagination exactly
  (pure string logic, unit-tested without network);
* each partition fetches ITS pages inside ``mapInPandas`` — the
  driver only fetches the count + first page (schema), so a
  million-feature layer never routes through the driver;
* Esri JSON geometries (point / multipoint / polyline / polygon
  rings) are assembled into WKB by the engine's own codec — no
  geopandas;
* this sandbox has no network, so ``fetch`` is injectable (the same
  seam as ``multimodal``'s decode): production uses the urllib
  default, tests inject a deterministic fake server. The fetcher must
  be importable/pickleable so executors can call it.
"""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T


def default_fetch(url: str) -> dict:
    """GET ``url`` -> parsed JSON (stdlib; no requests dependency)."""
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read().decode("utf-8"))


def paths_arcgis(url: str, batch: int, count: int) -> list:
    """Page URLs covering objectIds [1, count] in ``batch`` chunks —
    the reference's enumeration (``remotes.py:9-25``) with its
    final-page off-by-one corrected: the reference's half-open
    ``range(l, min(l+batch, count))`` silently drops objectId
    ``count`` (one feature per layer lost); here the last page is
    inclusive of it."""
    b = "/FeatureServer/0/query?"
    f0, f1 = url.split(b)
    f0 += b
    paths = []
    for lo in range(1, count + 1, batch):
        hi = min(lo + batch, count + 1)
        oid = "objectIds=" + ",".join(str(x) for x in range(lo, hi)) + "&"
        paths.append(f0 + oid + f1)
    return paths


def count_url(url: str) -> str:
    b = "/FeatureServer/0/query?"
    return url.split(b)[0] + b + "where=1%3D1&returnCountOnly=true&f=json"


def esri_geometry_to_wkb(geom: dict | None) -> bytes | None:
    """Esri JSON geometry -> WKB via the engine codec.

    rings -> Polygon/MultiPolygon (Esri marks holes by orientation;
    WKB ring order carries the same information, so rings are emitted
    in order), paths -> (Multi)LineString, points -> MultiPoint,
    x/y -> Point."""
    from cdap_geo_spark.core import wkb as W
    if not geom:
        return None
    if "x" in geom and "y" in geom:
        return W.point_to_wkb(float(geom["x"]), float(geom["y"]))
    if "points" in geom:
        pts = np.asarray(geom["points"], float)
        if len(pts) == 0:
            return None
        blobs = W.points_to_wkb(pts[:, 0], pts[:, 1])
        return blobs[0] if len(blobs) == 1 \
            else W.multi_to_wkb(W.KIND_MULTIPOINT, blobs)
    if "paths" in geom:
        lines = [W.linestring_to_wkb(np.asarray(p, float))
                 for p in geom["paths"] if len(p) >= 2]
        if not lines:
            return None
        return lines[0] if len(lines) == 1 \
            else W.multi_to_wkb(W.KIND_MULTILINESTRING, lines)
    if "rings" in geom:
        rings = [np.asarray(r, float) for r in geom["rings"]
                 if len(r) >= 4]
        if not rings:
            return None
        return W.polygon_to_wkb(rings)
    return None


def _spark_type(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


def read_arcgis(spark: SparkSession, url: str, *, batch: int = 200,
                fetch=default_fetch,
                num_partitions: int | None = None) -> DataFrame:
    """FeatureServer query URL -> DataFrame(attributes..., geometry WKB)
    (``cdap_geo/remotes.py:34-46``).

    Driver does two bounded calls (count + first page for the schema);
    every page fetch + Esri->WKB conversion runs executor-side. URLs
    with ``&returnGeometry=false&`` drop the geometry column, matching
    the reference."""
    count = int(fetch(count_url(url))["count"])
    paths = paths_arcgis(url, batch, count)
    if not paths:
        raise ValueError(f"empty layer at {url}")
    first = fetch(paths[0])
    feats = first.get("features", [])
    attrs = feats[0]["attributes"] if feats else {}
    with_geom = "&returnGeometry=false&" not in url
    fields = [T.StructField(k, _spark_type(v), True)
              for k, v in attrs.items()]
    if with_geom:
        fields.append(T.StructField("geometry", T.BinaryType(), True))
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    n = num_partitions or min(len(paths),
                              spark.sparkContext.defaultParallelism)
    pdf = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(n)

    def _scan(batches):
        for b in batches:
            for path in b["path"]:
                doc = fetch(str(path))
                rows = []
                for f in doc.get("features", []):
                    rec = [f["attributes"].get(k)
                           for k in names if k != "geometry"]
                    if with_geom:
                        rec.append(esri_geometry_to_wkb(f.get("geometry")))
                    rows.append(rec)
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    return pdf.mapInPandas(_scan, schema)


#: the reference's remote-layer catalog shape (``remotes.py:62-120``):
#: name -> {link, rename, read}. Links are retained verbatim as data;
#: nothing here fetches until read_arcgis is called with a fetcher.
REMOTE_CATALOG = {
    "region": {
        "link": "https://services1.arcgis.com/ESMARspQHYMw9BZ9/arcgis"
                "/rest/services/Regions_December_2021_EN_BFC"
                "/FeatureServer/0/query?where=1%3D1&outFields=RGN21NM"
                "&outSR=27700&f=json",
        "rename": {"RGN21NM": "Region"},
    },
    "county": {
        "link": "https://services1.arcgis.com/ESMARspQHYMw9BZ9/arcgis"
                "/rest/services/Counties_and_Unitary_Authorities_"
                "December_2021_UK_BFC/FeatureServer/0/query?"
                "where=1%3D1&outFields=CTYUA21NM&outSR=27700&f=json",
        "rename": {"CTYUA21NM": "County"},
    },
    "ward": {
        "link": "https://services1.arcgis.com/ESMARspQHYMw9BZ9/arcgis"
                "/rest/services/Wards_DEC_2021_UK_BFC_V2"
                "/FeatureServer/0/query?where=1%3D1&outFields=WD21NM"
                "&outSR=27700&f=json",
        "rename": {"WD21NM": "Ward"},
    },
}


def list_remotes() -> list:
    """Catalog names (``cdap_geo/remotes.py`` ``remote`` dict keys)."""
    return sorted(REMOTE_CATALOG)


def read_remote(spark: SparkSession, name: str, *,
                fetch=default_fetch, **kwargs) -> DataFrame:
    """Catalog name -> renamed DataFrame (``gdf_read_remote``
    semantics: fetch the layer, apply the catalog rename)."""
    ent = REMOTE_CATALOG[name]
    df = read_arcgis(spark, ent["link"], fetch=fetch, **kwargs)
    for old, new in ent["rename"].items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df
