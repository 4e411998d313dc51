"""Deterministic synthetic fixtures (FIXTURES.md) — no external data.

Every generator is a pure function of the row id (splitmix64-style bit
mixing), so tables are byte-reproducible at any scale factor and can be
generated DISTRIBUTED via ``spark.range(n)`` + Arrow PUDFs — no driver
bottleneck, no seed-state coupling between partitions (the property a
1000-executor generation job needs).

Coordinates are planar metres snapped to 3 dp (1 mm), matching the
reference's precision normalization (``cdap_geo/sedona.py:39,60-66``).
Extent: [0, 700000] x [0, 1300000] (BNG-like, cf.
``cdap_geo/index_bbox.py:32``); 80% uniform + 20% clustered in 5
Gaussian hot spots (drives the skew/salting tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cdap_geo_spark.core import wkb as W
from cdap_geo_spark.docs import DOCS_SCHEMA

EXTENT = (0.0, 0.0, 700_000.0, 1_300_000.0)
HOTSPOTS = [(120_000, 180_000), (530_000, 180_000), (350_000, 650_000),
            (150_000, 1_100_000), (600_000, 1_200_000)]
HOTSPOT_SIGMA = 8_000.0


def _mix(ids: np.ndarray, salt) -> np.ndarray:
    """splitmix64 finalizer — uniform uint64 stream per (id, salt).

    ``salt`` may be a scalar or an array aligned with ``ids``.
    """
    with np.errstate(over="ignore"):
        salt_arr = np.asarray(salt, dtype=np.uint64)
        z = ids.astype(np.uint64) + \
            np.uint64(0x9E3779B97F4A7C15) * (salt_arr + np.uint64(1))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _unit(ids: np.ndarray, salt) -> np.ndarray:
    """uniform [0,1) doubles per (id, salt)."""
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _snap(v: np.ndarray) -> np.ndarray:
    return np.round(v, 3)


def doc_coords(ids: np.ndarray) -> tuple:
    """Deterministic (x, y) per doc id: 80% uniform, 20% hot-spot."""
    u_cluster = _unit(ids, 1)
    x = EXTENT[0] + _unit(ids, 2) * (EXTENT[2] - EXTENT[0])
    y = EXTENT[1] + _unit(ids, 3) * (EXTENT[3] - EXTENT[1])
    hot = u_cluster < 0.2
    which = (_mix(ids, 4) % np.uint64(len(HOTSPOTS))).astype(np.int64)
    hx = np.array([h[0] for h in HOTSPOTS], np.float64)[which]
    hy = np.array([h[1] for h in HOTSPOTS], np.float64)[which]
    # Box–Muller from two uniform streams
    u1 = np.clip(_unit(ids, 5), 1e-12, 1.0)
    u2 = _unit(ids, 6)
    r = HOTSPOT_SIGMA * np.sqrt(-2.0 * np.log(u1))
    gx = r * np.cos(2 * np.pi * u2)
    gy = r * np.sin(2 * np.pi * u2)
    x = np.where(hot, np.clip(hx + gx, EXTENT[0], EXTENT[2]), x)
    y = np.where(hot, np.clip(hy + gy, EXTENT[1], EXTENT[3]), y)
    return _snap(x), _snap(y)


def doc_geometry_wkb(ids: np.ndarray) -> list:
    """Deterministic geometry per doc: 70% Point, 20% Polygon (regular
    star / convex n-gon, 4-64 vertices), 8% LineString, 2% MultiPoint."""
    x, y = doc_coords(ids)
    kind_u = _unit(ids, 7)
    out: list = [None] * len(ids)
    is_pt = kind_u < 0.70
    is_poly = (kind_u >= 0.70) & (kind_u < 0.90)
    is_line = (kind_u >= 0.90) & (kind_u < 0.98)
    is_multi = kind_u >= 0.98
    if is_pt.any():
        idx = np.flatnonzero(is_pt)
        blobs = W.points_to_wkb(x[idx], y[idx])
        for j, b in zip(idx, blobs):
            out[j] = b
    nvert = 4 + (_mix(ids, 8) % np.uint64(61)).astype(np.int64)  # 4..64
    radius = 50.0 + _unit(ids, 9) * 2000.0
    spiky = _unit(ids, 10) < 0.5
    for j in np.flatnonzero(is_poly):
        n = int(nvert[j])
        ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        rr = np.full(n, radius[j])
        if spiky[j]:
            rr = rr * np.where(np.arange(n) % 2 == 0, 1.0, 0.45)  # star
        ring = np.column_stack([
            _snap(x[j] + rr * np.cos(ang)), _snap(y[j] + rr * np.sin(ang))])
        ring = np.vstack([ring, ring[:1]])
        out[j] = W.polygon_to_wkb([ring])
    nline = 2 + (_mix(ids, 11) % np.uint64(6)).astype(np.int64)
    nmulti = 2 + (_mix(ids, 12) % np.uint64(3)).astype(np.int64)
    for j in np.flatnonzero(is_line):
        n = int(nline[j])
        t = np.arange(n, dtype=np.float64)
        lx = _snap(x[j] + t * 300.0 * np.cos(0.1 + float(ids[j] % 7)))
        ly = _snap(y[j] + t * 300.0 * np.sin(0.1 + float(ids[j] % 7)))
        out[j] = W.linestring_to_wkb(np.column_stack([lx, ly]))
    for j in np.flatnonzero(is_multi):
        n = int(nmulti[j])
        dd = np.arange(n, dtype=np.float64) * 211.0
        pts = W.points_to_wkb(_snap(x[j] + dd), _snap(y[j] + dd * 0.5))
        out[j] = W.multi_to_wkb(W.KIND_MULTIPOINT, pts)
    return out


def _docs_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Interleaved docs batch: 1-8 spans, >=1 geometry span, offsets
    strictly increasing, kinds interleaved (FIXTURES.md §1).

    Fully vectorized over the flattened (doc, span) pairs; only the
    final dict assembly is per-span Python.
    """
    m = len(ids)
    geoms = doc_geometry_wkb(ids)
    nspans = 1 + (_mix(ids, 20) % np.uint64(8)).astype(np.int64)
    gpos = (_mix(ids, 21) % nspans.astype(np.uint64)).astype(np.int64)
    owner = np.repeat(np.arange(m), nspans)
    span_no = np.arange(len(owner)) - np.repeat(
        np.concatenate(([0], np.cumsum(nspans)[:-1])), nspans)
    oid = ids[owner]
    gaps = 1 + (_mix(oid, 22 + span_no.astype(np.uint64) * np.uint64(977))
                % np.uint64(500)).astype(np.int64)
    # per-doc strictly increasing offsets: cumsum of gaps minus each
    # doc's preceding total
    cum = np.cumsum(gaps)
    doc_base = np.concatenate(([0], cum[np.cumsum(nspans) - 1][:-1]))
    offsets = (cum - doc_base[owner]).astype(np.int64)
    is_geom = span_no == gpos[owner]
    is_img = ~is_geom & (_unit(oid, 40 + span_no.astype(np.uint64)) < 0.25)

    doc_names = np.array([f"doc{int(g):012d}" for g in ids], dtype=object)
    spans_per_doc: list = [[] for _ in range(m)]
    for o, s, off, g, im in zip(owner, span_no, offsets, is_geom, is_img):
        if g:
            span = {"kind": "geometry", "text": None,
                    "media_ref": geoms[o].hex(), "offset": int(off)}
        elif im:
            span = {"kind": "image", "text": None,
                    "media_ref": f"img://{int(ids[o])}-{int(s)}",
                    "offset": int(off)}
        else:
            span = {"kind": "text", "text": f"span text {int(ids[o])}-{int(s)}",
                    "media_ref": None, "offset": int(off)}
        spans_per_doc[o].append(span)
    return pd.DataFrame({"doc_id": doc_names, "spans": spans_per_doc},
                        columns=["doc_id", "spans"])


def documents(spark: SparkSession, n: int,
              partitions: int | None = None) -> DataFrame:
    """Distributed interleaved-docs table of n rows."""
    rng = spark.range(n, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield _docs_pdf(pdf["id"].to_numpy(np.int64))

    return rng.mapInPandas(gen, schema=DOCS_SCHEMA)


REGIONS_SCHEMA = T.StructType([
    T.StructField("region_id", T.StringType(), False),
    T.StructField("name", T.StringType()),
    T.StructField("geometry", T.BinaryType()),
])


def regions(spark: SparkSession, n: int) -> DataFrame:
    """Polygon join partner (FIXTURES.md §2): boxes, convex polygons,
    concave rings; ~2% are country-sized multi-cell polygons."""
    rng = spark.range(n)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            m = len(ids)
            cx = EXTENT[0] + _unit(ids, 101) * (EXTENT[2] - EXTENT[0])
            cy = EXTENT[1] + _unit(ids, 102) * (EXTENT[3] - EXTENT[1])
            big = _unit(ids, 103) < 0.02
            size = np.where(big, 150_000 + _unit(ids, 104) * 250_000,
                            2_000 + _unit(ids, 104) * 30_000)
            shape_u = _unit(ids, 105)
            geoms = []
            for j in range(m):
                if shape_u[j] < 0.4:  # axis-aligned box
                    geoms.append(W.boxes_to_wkb(
                        np.array([_snap(cx[j] - size[j] / 2)]),
                        np.array([_snap(cy[j] - size[j] / 2)]),
                        np.array([_snap(cx[j] + size[j] / 2)]),
                        np.array([_snap(cy[j] + size[j] / 2)]))[0])
                else:
                    nv = 5 + int(_mix(ids[j:j + 1], 106)[0] % np.uint64(20))
                    ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
                    rr = np.full(nv, size[j] / 2)
                    if shape_u[j] >= 0.75:  # concave star
                        rr *= np.where(np.arange(nv) % 2 == 0, 1.0, 0.5)
                    ring = np.column_stack([
                        _snap(cx[j] + rr * np.cos(ang)),
                        _snap(cy[j] + rr * np.sin(ang))])
                    ring = np.vstack([ring, ring[:1]])
                    geoms.append(W.polygon_to_wkb([ring]))
            yield pd.DataFrame({
                "region_id": [f"r{int(i):06d}" for i in ids],
                "name": [f"region {int(i)}" for i in ids],
                "geometry": geoms,
            })

    return rng.mapInPandas(gen, schema=REGIONS_SCHEMA)


KNN_SCHEMA = T.StructType([
    T.StructField("query_id", T.StringType(), False),
    T.StructField("geometry", T.BinaryType()),
    T.StructField("k", T.IntegerType()),
])


def knn_queries(spark: SparkSession, n: int) -> DataFrame:
    """Probe points: half near hot spots, half in empty areas
    (forces multi-ring expansion); k cycles {1,5,10}."""
    ids = np.arange(n, dtype=np.int64)
    x, y = doc_coords(ids * 7919 + 13)
    blobs = W.points_to_wkb(x, y)
    pdf = pd.DataFrame({
        "query_id": [f"q{int(i):05d}" for i in ids],
        "geometry": blobs,
        "k": [(1, 5, 10)[int(i) % 3] for i in ids],
    })
    return spark.createDataFrame(pdf, schema=KNN_SCHEMA)
