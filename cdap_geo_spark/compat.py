"""Reference-API compatibility surface.

Mirrors the public API of ``aw-west-defra/cdap_geo``
(``cdap_geo/__init__.py:1-52``, README.md:16-47) on top of this
engine, so reference users can switch imports and run their existing
queries::

    import cdap_geo_spark.compat as cdap_geo
    pairs = cdap_geo.join(df_input, other)           # bbox sjoin
    df = df.withColumn('area', cdap_geo.area('geometry'))
    df = df.withColumn('bng', cdap_geo.bng('geometry', 1000))

Deviations (each documented at the member):

* types: geometry math returns DoubleType where the reference used
  FloatType (cast down at the edge if needed);
* ``crs`` supports the closed-form EPSG:4326<->3857 pair (pyproj is
  unavailable here);
* ``intersection`` geometry output requires a convex right operand
  (Sutherland–Hodgman clip); ``intersection_area`` matches it;
* GeoPackage/remote readers are out of scope (no JDBC sqlite/network);
* ``to_sdf``/``to_gdf`` convert pandas frames with WKB bytes columns
  (geopandas is unavailable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cdap_geo_spark import udfs
from cdap_geo_spark.core import cells as C, geom as G, wkb as W

# ---------------------------------------------------------------------------
# BNG reference encoding (semantics of cdap_geo/_indexing.py:20-105,
# vectorized; 'I' excluded from the alphabet)
# ---------------------------------------------------------------------------

_LETTERS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"
_NUMBERS_LENGTH = {1: 5, 10: 4, 100: 3, 1_000: 2, 10_000: 1, 100_000: 0}
BNG_RESOLUTIONS = (1, 10, 100, 1_000, 10_000, 100_000)


def bng_refs(eastings: np.ndarray, northings: np.ndarray,
             resolution: int) -> list:
    """Vectorized (easting, northing) -> BNG grid reference strings.

    Matches ``_coords_to_bng`` (``cdap_geo/_indexing.py:73-105``): the
    letter pair is a base-25 encoding of the 500 km/100 km quotients,
    digits are the remainders truncated to the resolution's length.
    """
    if resolution not in _NUMBERS_LENGTH:
        raise ValueError(f"resolution {resolution} not in {BNG_RESOLUTIONS}")
    e = eastings.astype(np.int64)
    n = northings.astype(np.int64)
    eq, er = e // 100_000, e % 100_000
    nq, nr = n // 100_000, n % 100_000
    first = (19 - nq) - (19 - nq) % 5 + (eq + 10) // 5
    second = (19 - nq) * 5 % 25 + eq % 5
    ln = _NUMBERS_LENGTH[resolution]
    out = []
    for f1, f2, a, b in zip(first, second, er, nr):
        digits = f"{int(a):05d}"[:ln] + f"{int(b):05d}"[:ln]
        out.append(_LETTERS[int(f1)] + _LETTERS[int(f2)] + digits)
    return out


def bng(column, resolution: int = 1000, how: str = "intersects"):
    """array<string> of BNG refs covering the geometry — semantics of
    ``calculate_bng_index`` (``cdap_geo/_indexing.py:349-446``):
    bbox cover padded by 1 m with floor/ceil snapping (:116-127),
    point edge-straddle (:192-216), ``how='intersects'`` keeps only
    cells whose box intersects the geometry (:232-270)."""
    if resolution not in _NUMBERS_LENGTH:
        raise ValueError(f"resolution {resolution} not in {BNG_RESOLUTIONS}")
    if how not in ("bounding box", "intersects"):
        raise ValueError("how must be 'bounding box' or 'intersects'")

    @pandas_udf(T.ArrayType(T.StringType()))
    def _bng(s: pd.Series) -> pd.Series:
        batch = W.parse_wkb([None if v is None else bytes(v) for v in s])
        b = batch.bounds()
        res = float(resolution)
        out = []
        for g in range(len(batch)):
            if not batch.valid[g] or np.isnan(b[g, 0]):
                out.append([])
                continue
            if batch.kinds[g] in (W.KIND_POINT, W.KIND_MULTIPOINT):
                pts = G._geom_points(batch, g)
                cells = set()
                for x, y in pts:
                    on_vx = int(x) % resolution == 0
                    on_hy = int(y) % resolution == 0
                    dxs = (-1.0, 1.0) if on_vx else (0.0,)
                    dys = (-1.0, 1.0) if on_hy else (0.0,)
                    for dx in dxs:
                        for dy in dys:
                            cells.add((np.floor((x + dx) / res) * res,
                                       np.floor((y + dy) / res) * res))
                ex = np.array([c[0] for c in cells])
                ny = np.array([c[1] for c in cells])
                out.append(sorted(bng_refs(ex, ny, resolution)))
                continue
            x1 = np.floor((b[g, 0] - 1.0) / res) * res
            y1 = np.floor((b[g, 1] - 1.0) / res) * res
            x2 = np.ceil((b[g, 2] + 1.0) / res) * res
            y2 = np.ceil((b[g, 3] + 1.0) / res) * res
            xs = np.arange(x1, x2, res)
            ys = np.arange(y1, y2, res)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            gx, gy = gx.ravel(), gy.ravel()
            if how == "intersects" and len(gx) > 1:
                boxes = W.parse_wkb(W.boxes_to_wkb(gx, gy, gx + res, gy + res))
                keep = G.pairs_intersect(
                    boxes, batch, np.arange(len(gx)),
                    np.full(len(gx), g, np.int64))
                gx, gy = gx[keep], gy[keep]
            out.append(bng_refs(gx, gy, resolution))
        return pd.Series(out)
    return _bng(column) if isinstance(column, (str, Column)) else _bng


def bbox(column, resolutions=(100_000, 100_000),
         limits=(-500_000, -500_000, 1_500_000, 1_500_000)):
    """array<string> fixed-grid '{x}-{y}' cell ids — the reference's
    ``bbox_index`` reproduced bit-for-bit (``cdap_geo/index_bbox.py:15-30``
    via the compat grid cover)."""
    from cdap_geo_spark.operators.tiles import grid_cover_udf
    b = udfs.st_bounds()(F.col(column) if isinstance(column, str) else column)
    cov = grid_cover_udf(resolutions, limits, compat="reference")
    return cov(b["minx"], b["miny"], b["maxx"], b["maxy"])


# ---------------------------------------------------------------------------
# scalar functions (reference cdap_geo/functions.py)
# ---------------------------------------------------------------------------

def area(column) -> Column:
    """``cdap_geo.area`` (``functions.py:12-14``); DoubleType here."""
    return udfs.st_area()(_c(column))


def bounds(column) -> Column:
    """array<double>[4] (minx,miny,maxx,maxy) — positional like the
    reference (``functions.py:26-28``)."""
    b = udfs.st_bounds()(_c(column))
    return F.array(b["minx"], b["miny"], b["maxx"], b["maxy"])


def buffer(column, resolution: float, **kwargs) -> Column:
    """``functions.py:20-24``; point->n-gon disc, else bbox dilation
    (documented deviation, see operators.geoops.st_buffer)."""
    from cdap_geo_spark.operators.geoops import st_buffer
    return st_buffer(resolution)(_c(column))


def crs(column, crs_from, crs_to=27700) -> Column:
    """``functions.py:30-35``; closed-form pairs only (no pyproj)."""
    from cdap_geo_spark.operators.geoops import st_transform
    return st_transform(_epsg(crs_from), _epsg(crs_to))(_c(column))


def intersects(left, right) -> Column:
    return udfs.st_intersects()(_c(left), _c(right))


def intersection_area(left, right) -> Column:
    return udfs.st_intersection_area()(_c(left), _c(right))


def intersection(left, right) -> Column:
    """Clipped geometry (``functions.py:80-86``): Sutherland–Hodgman,
    right operand must be convex (boxes/tiles/convex regions)."""
    @pandas_udf(T.BinaryType())
    def _inter(l: pd.Series, r: pd.Series) -> pd.Series:
        lb = W.parse_wkb([None if v is None else bytes(v) for v in l])
        rb = W.parse_wkb([None if v is None else bytes(v) for v in r])
        out = []
        for i in range(len(lb)):
            ring = _clip_ring_of(lb, rb, i)
            out.append(None if ring is None else W.polygon_to_wkb([ring]))
        return pd.Series(out)
    return _inter(_c(left), _c(right))


def _clip_ring_of(lb, rb, i):
    l_rings = G._geom_polygon_rings(lb, i)
    r_rings = G._geom_polygon_rings(rb, i)
    if not l_rings or not r_rings:
        return None
    clipped = G._clip_ring(l_rings[0], r_rings[0])
    if clipped is None or len(clipped) < 3:
        return None
    return np.vstack([clipped, clipped[:1]])


def unary_union(column) -> Column:
    from cdap_geo_spark.operators.geoops import unary_union_udf
    return unary_union_udf()(_c(column))


def pointify(column, resolution: float, as_struct: bool = True) -> Column:
    from cdap_geo_spark.operators.geoops import st_pointify
    return st_pointify(resolution, as_struct)(_c(column))


# ---------------------------------------------------------------------------
# joins (reference index_bbox.py / index_bng.py / sedona.py)
# ---------------------------------------------------------------------------

def join(left: DataFrame, right: DataFrame, lsuffix: str = "",
         rsuffix: str = "_right", **kwargs) -> DataFrame:
    """``cdap_geo.join`` = bbox_join (``index_bbox.py:32-71``):
    candidate pairs whose BOUNDING BOXES overlap, with full rows from
    both sides and colliding columns suffix-renamed. NOT exact —
    chain ``.filter(intersects(...))`` or use :func:`bbox_intersects`
    (the reference's contract)."""
    return _full_join(left, right, "bbox", lsuffix, rsuffix, **kwargs)


def bbox_intersects(left: DataFrame, right: DataFrame,
                    **kwargs) -> DataFrame:
    """``index_bbox.py:73-76``: bbox join + exact intersects filter."""
    return _full_join(left, right, "intersects", "", "_right", **kwargs)


def bng_join(left: DataFrame, right: DataFrame, resolution: int = 1000,
             **kwargs) -> DataFrame:
    """``index_bng.py:16-36``: same join at a BNG-like cell size. The
    engine maps the metre resolution to the nearest power-of-two cell
    level — pair results are level-invariant (property-tested), so the
    output rows match the reference's."""
    level = int(np.clip(round(np.log2(C.WORLD_SIZE / resolution)), 0,
                        C.MAX_LEVEL))
    return _full_join(left, right, "bbox", "", "_right", level=level,
                      **kwargs)


def st_join(df_left: DataFrame, df_right: DataFrame,
            distance: float | None = None, lsuffix: str = "_left",
            rsuffix: str = "_right", **kwargs) -> DataFrame:
    """``sedona.py:119-151``: exact intersects join, or distance<=d
    join — via the cell planner, never a nested loop."""
    pred = "distance" if distance else "intersects"
    return _full_join(df_left, df_right, pred, "", rsuffix,
                      distance=distance, **kwargs)


def st_intersects(df0: DataFrame, df1: DataFrame, **kwargs) -> DataFrame:
    """``sedona.py:105-108``: left rows with >=1 intersecting partner
    (kept once per match in the reference — duplicates preserved)."""
    return _full_join(df0, df1, "intersects", "", "_right", **kwargs) \
        .select(*[c for c in df0.columns])


def _full_join(left, right, predicate, lsuffix, rsuffix, level=None,
               distance=None, **kwargs):
    from cdap_geo_spark.operators.sjoin import sjoin
    l = left
    if "_cg_lid" not in l.columns:
        l = l.withColumn("_cg_lid", F.monotonically_increasing_id())
        # the reference caches to stabilize these ids
        # (index_bbox.py:36-43); we do the same
        l = l.persist()
    r = right
    if "_cg_rid" not in r.columns:
        r = r.withColumn("_cg_rid", F.monotonically_increasing_id())
        r = r.persist()
    out = sjoin(l, r, left_id="_cg_lid", right_id="_cg_rid",
                lsuffix=lsuffix, rsuffix=rsuffix,
                predicate=predicate,
                level=level if level is not None else 7,
                distance=distance, **kwargs)
    return out.drop("_cg_lid", "_cg_rid")


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def _epsg(v) -> str:
    return v if isinstance(v, str) and v.startswith("EPSG") else f"EPSG:{v}"


# ---------------------------------------------------------------------------
# convert / io (reference convert.py, read.py, write.py)
# ---------------------------------------------------------------------------

def to_sdf(data, spark=None) -> DataFrame:
    """pandas frame (geometry = WKB bytes) or list of WKB -> Spark DF
    (``convert.py:52-63``; geopandas edges unavailable)."""
    from pyspark.sql import SparkSession
    spark = spark or SparkSession.active()
    if isinstance(data, pd.DataFrame):
        return spark.createDataFrame(data)
    if isinstance(data, (list, tuple)):
        return spark.createDataFrame(
            pd.DataFrame({"geometry": list(data)}))
    raise TypeError(type(data))


def to_gdf(df: DataFrame) -> pd.DataFrame:
    """Spark DF -> pandas with raw WKB bytes (``convert.py:66-70``)."""
    return df.toPandas()


def write_geoparquet(sdf: DataFrame, path: str, crs=27700, **kwargs) -> None:
    """``write.py:101-124``: parquet + dataset metadata. Here the geo
    metadata (crs, bbox, encoding) goes into the checkpoint manifest
    instead of a parquet-footer rewrite — no second scan."""
    import json
    import os
    sdf.write.mode("overwrite").parquet(path)
    b = udfs.st_bounds()(F.col("geometry"))
    row = sdf.select(b.alias("_b")).agg(
        F.min("_b.minx"), F.min("_b.miny"),
        F.max("_b.maxx"), F.max("_b.maxy")).collect()[0]
    meta = {"primary_column": "geometry", "encoding": "WKB",
            "crs": crs, "bbox": list(row), "schema_version": "0.1.0"}
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        json.dump(meta, f)


def ingest(spark, docs: DataFrame, path_out: str,
           bng_resolution: int = 1000, **kwargs) -> DataFrame:
    """``read.py:120-160``: index + spatially cluster + write."""
    from cdap_geo_spark.io import ingest as _ingest
    level = int(np.clip(round(np.log2(C.WORLD_SIZE / bng_resolution)), 0,
                        C.MAX_LEVEL))
    return _ingest(spark, docs, path_out, level=level, **kwargs)
