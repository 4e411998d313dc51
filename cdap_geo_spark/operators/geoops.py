"""Secondary geometry operators from the reference's surface.

Covers SURVEY.md §2 rows not owned by sjoin/tiles/knn:

* ``st_group``/``unary_union`` — dissolve per key
  (``cdap_geo/sedona.py:94-102``, ``cdap_geo/functions.py:16-18``);
* ``pointify`` — rasterize to a centre-point grid
  (``cdap_geo/functions.py:90-124``);
* ``buffer`` — point->disc n-gon; bbox dilation otherwise
  (``cdap_geo/functions.py:20-24``, robustness note ``sedona.py:70-71``);
* ``crs`` reprojection — closed-form web-mercator <-> WGS84
  (``cdap_geo/functions.py:30-35``; pyproj unavailable, documented);
* ``st_explode2`` (ST_Dump) part explode and ``st_explode``
  (ST_SubDivideExplode) as cell-bounded work units
  (``cdap_geo/sedona.py:80-91``);
* ``encode_box`` dynamic-resolution common-prefix cell (the geohash
  trick, ``cdap_geo/index_geohash.py:15-29``) as an int64 sort key;
* GPKG blob header parse (``cdap_geo/read.py:51-71``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cdap_geo_spark.core import cells as C, geom as G, wkb as W


# ---------------------------------------------------------------------------
# dissolve / union aggregate
# ---------------------------------------------------------------------------

def st_group(df: DataFrame, key: str, geom_col: str = "geometry",
             level: int | None = None) -> DataFrame:
    """Dissolve geometries per key — the reverse of explode
    (``st_group``, ``cdap_geo/sedona.py:94-102``).

    Without a constructive polygon-clipping library the v1 dissolve is
    a *collection union*: per key, all parts are assembled into one
    MultiPolygon/MultiPoint/etc WKB (geometrically equal to the true
    union when members don't overlap — the common dissolve case), plus
    the exact dissolved CELL COVER at ``level`` (cell-set union — the
    semantic the engine's joins consume). Documented deviation: areas
    of overlapping members double-count in ``union_area``.
    """
    out_fields = [df.schema[key],
                  T.StructField("geometry", T.BinaryType()),
                  T.StructField("n_parts", T.IntegerType()),
                  T.StructField("union_area", T.DoubleType())]
    if level is not None:
        out_fields.append(T.StructField("cells", T.ArrayType(T.LongType())))
    schema = T.StructType(out_fields)

    def dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = [None if b is None else bytes(b) for b in pdf[geom_col]]
        batch = W.parse_wkb(blobs)
        merged = _merge_blobs(blobs, batch)
        area = float(G.area(batch).sum())
        row = {pdf.columns[0]: pdf[key].iloc[0], "geometry": merged,
               "n_parts": int(batch.valid.sum()), "union_area": area}
        if level is not None:
            off, cc, _ = C.cover_batch(batch, level, how="intersects")
            row["cells"] = np.unique(cc)
        return pd.DataFrame([row])

    return df.select(key, geom_col).groupBy(key).applyInPandas(
        dissolve, schema=schema)


def _merge_blobs(blobs, batch) -> bytes | None:
    """Assemble valid member geometries into one Multi* WKB."""
    members = []
    kinds = set()
    for b, ok, k in zip(blobs, batch.valid, batch.kinds):
        if not ok:
            continue
        k = int(k)
        if k in (W.KIND_MULTIPOINT, W.KIND_MULTILINESTRING,
                 W.KIND_MULTIPOLYGON):
            # flatten: strip the multi header, keep members
            inner = _split_multi(b)
            members.extend(inner)
            kinds.add(k - 3)
        else:
            members.append(b)
            kinds.add(k)
    if not members:
        return None
    if len(members) == 1:
        return members[0]
    if kinds == {W.KIND_POINT}:
        mk = W.KIND_MULTIPOINT
    elif kinds == {W.KIND_LINESTRING}:
        mk = W.KIND_MULTILINESTRING
    elif kinds == {W.KIND_POLYGON}:
        mk = W.KIND_MULTIPOLYGON
    else:
        mk = W.KIND_COLLECTION
    return W.multi_to_wkb(mk, members)


def _split_multi(blob: bytes) -> list:
    """Member WKBs of a little-endian Multi* blob."""
    n = int.from_bytes(blob[5:9], "little")
    out = []
    pos = 9
    single = W.parse_wkb([blob])
    # re-emit members from the parsed batch (handles any byte order)
    for p in range(single.geom_part_off[0], single.geom_part_off[1]):
        k = int(single.part_kind[p])
        rings = []
        for ri in range(single.part_ring_off[p], single.part_ring_off[p + 1]):
            s, e = single.ring_coord_off[ri], single.ring_coord_off[ri + 1]
            rings.append(single.coords[s:e])
        if k == W.KIND_POINT and rings:
            out.append(W.point_to_wkb(rings[0][0][0], rings[0][0][1]))
        elif k == W.KIND_LINESTRING and rings:
            out.append(W.linestring_to_wkb(rings[0]))
        elif k == W.KIND_POLYGON:
            out.append(W.polygon_to_wkb(rings))
    return out


def unary_union_udf(level: int | None = None):
    """array<WKB> -> WKB collection union (``cdap_geo/functions.py:16-18``)."""
    @pandas_udf(T.BinaryType())
    def _uu(arrs: pd.Series) -> pd.Series:
        out = []
        for arr in arrs:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            blobs = [None if b is None else bytes(b) for b in arr]
            batch = W.parse_wkb(blobs)
            out.append(_merge_blobs(blobs, batch))
        return pd.Series(out)
    return _uu


# ---------------------------------------------------------------------------
# pointify (rasterize to centre-point grid)
# ---------------------------------------------------------------------------

POINTIFY_TYPE = T.StructType([
    T.StructField("count", T.IntegerType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("points", T.ArrayType(T.BinaryType())),
])


def st_pointify(resolution: float, as_struct: bool = True):
    """WKB polygon -> grid of centre points inside it.

    Reference semantics (``cdap_geo/functions.py:90-124``): meshgrid of
    cell centres over the bbox at ``resolution``, vectorized
    point-in-polygon; ``count`` = points inside, ``mean`` = fraction of
    grid points inside (the coverage ratio), ``points`` = WKB centres.
    """
    def _compute(s: pd.Series):
        batch = W.parse_wkb([None if v is None else bytes(v) for v in s])
        b = batch.bounds()
        counts, means, pts = [], [], []
        for g in range(len(batch)):
            rings = G._geom_polygon_rings(batch, g)
            if not batch.valid[g] or not rings or np.isnan(b[g, 0]):
                counts.append(0)
                means.append(0.0)
                pts.append([])
                continue
            xs = np.arange(b[g, 0] + resolution / 2, b[g, 2], resolution)
            ys = np.arange(b[g, 1] + resolution / 2, b[g, 3], resolution)
            if len(xs) == 0 or len(ys) == 0:
                counts.append(0)
                means.append(0.0)
                pts.append([])
                continue
            gx, gy = np.meshgrid(xs, ys)
            gx, gy = gx.ravel(), gy.ravel()
            isin = G.points_in_rings(gx, gy, rings)
            counts.append(int(isin.sum()))
            means.append(float(isin.mean()))
            pts.append(W.points_to_wkb(gx[isin], gy[isin]))
        return counts, means, pts

    if as_struct:
        @pandas_udf(POINTIFY_TYPE)
        def _pf_struct(s: pd.Series) -> pd.DataFrame:
            counts, means, pts = _compute(s)
            return pd.DataFrame({"count": counts, "mean": means,
                                 "points": pts})
        return _pf_struct

    @pandas_udf(T.ArrayType(T.BinaryType()))
    def _pf_points(s: pd.Series) -> pd.Series:
        return pd.Series(_compute(s)[2])
    return _pf_points


# ---------------------------------------------------------------------------
# buffer / transform
# ---------------------------------------------------------------------------

def st_buffer(radius: float, segments: int = 16):
    """WKB -> WKB buffered geometry.

    Points buffer to a ``segments``-gon disc (exact up to the n-gon
    approximation); other geometries buffer to their dilated bbox —
    a DOCUMENTED v1 deviation (exact round-joint offsetting is out of
    scope; the distance-join path never needs buffer geometry at all,
    it uses exact distance refinement — ``sjoin predicate='distance'``).
    """
    @pandas_udf(T.BinaryType())
    def _buf(s: pd.Series) -> pd.Series:
        batch = W.parse_wkb([None if v is None else bytes(v) for v in s])
        b = batch.bounds()
        out = []
        ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
        for g in range(len(batch)):
            if not batch.valid[g]:
                out.append(None)
                continue
            if batch.kinds[g] == W.KIND_POINT:
                cx, cy = b[g, 0], b[g, 1]
                ring = np.column_stack([cx + radius * np.cos(ang),
                                        cy + radius * np.sin(ang)])
                ring = np.vstack([ring, ring[:1]])
                out.append(W.polygon_to_wkb([ring]))
            else:
                out.append(W.boxes_to_wkb(
                    np.array([b[g, 0] - radius]), np.array([b[g, 1] - radius]),
                    np.array([b[g, 2] + radius]),
                    np.array([b[g, 3] + radius]))[0])
        return pd.Series(out)
    return _buf


_R = 6_378_137.0  # WGS84 spherical radius (web-mercator convention)


def st_transform(src: str, dst: str):
    """Closed-form CRS reprojection: 'EPSG:4326' <-> 'EPSG:3857'.

    The reference delegates to pyproj (``cdap_geo/functions.py:30-35``),
    unavailable here; web-mercator is the closed-form pair every tile
    pipeline needs. Unknown pairs raise.
    """
    def fwd(x, y):  # 4326 -> 3857
        mx = np.radians(x) * _R
        my = _R * np.log(np.tan(np.pi / 4 + np.radians(y) / 2))
        return mx, my

    def inv(x, y):  # 3857 -> 4326
        lon = np.degrees(x / _R)
        lat = np.degrees(2 * np.arctan(np.exp(y / _R)) - np.pi / 2)
        return lon, lat

    if (src, dst) == ("EPSG:4326", "EPSG:3857"):
        f = fwd
    elif (src, dst) == ("EPSG:3857", "EPSG:4326"):
        f = inv
    elif src == dst:
        f = lambda x, y: (x, y)  # noqa: E731
    else:
        raise ValueError(f"unsupported CRS pair {src}->{dst}")

    @pandas_udf(T.BinaryType())
    def _tr(s: pd.Series) -> pd.Series:
        blobs = [None if v is None else bytes(v) for v in s]
        batch = W.parse_wkb(blobs)
        nx, ny = f(batch.coords[:, 0], batch.coords[:, 1])
        batch.coords[:, 0] = nx
        batch.coords[:, 1] = ny
        return pd.Series(_reemit(batch, blobs))
    return _tr


def _reemit(batch, orig_blobs) -> list:
    """Emit WKB per geometry from (possibly mutated) batch coords."""
    out = []
    for g in range(len(batch)):
        if not batch.valid[g]:
            out.append(None)
            continue
        parts = []
        for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
            k = int(batch.part_kind[p])
            rings = []
            for ri in range(batch.part_ring_off[p],
                            batch.part_ring_off[p + 1]):
                s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
                rings.append(batch.coords[s:e])
            if k == W.KIND_POINT and rings:
                parts.append(W.point_to_wkb(rings[0][0][0], rings[0][0][1]))
            elif k == W.KIND_LINESTRING and rings:
                parts.append(W.linestring_to_wkb(rings[0]))
            elif k == W.KIND_POLYGON:
                parts.append(W.polygon_to_wkb(rings))
        if len(parts) == 1 and batch.kinds[g] in (W.KIND_POINT,
                                                  W.KIND_LINESTRING,
                                                  W.KIND_POLYGON):
            out.append(parts[0])
        else:
            base = int(batch.kinds[g])
            mk = base if base >= W.KIND_MULTIPOINT else base + 3
            out.append(W.multi_to_wkb(mk, parts))
    return out


# ---------------------------------------------------------------------------
# explode / subdivide
# ---------------------------------------------------------------------------

def st_dump(df: DataFrame, geom_col: str = "geometry",
            id_col: str = "doc_id") -> DataFrame:
    """Explode multi-geometries to parts (ST_Dump,
    ``cdap_geo/sedona.py:88-91``): one row per part with part_idx."""
    schema = T.StructType([df.schema[id_col],
                           T.StructField("part_idx", T.IntegerType()),
                           T.StructField("geometry", T.BinaryType())])

    def gen(batches):
        for pdf in batches:
            blobs = [None if v is None else bytes(v) for v in pdf[geom_col]]
            batch = W.parse_wkb(blobs)
            ids, pidx, geoms = [], [], []
            for g in range(len(batch)):
                if not batch.valid[g]:
                    continue
                single = W.slice_batch(batch, np.array([g]))
                parts = _reemit_parts(single)
                for j, blob in enumerate(parts):
                    ids.append(pdf[id_col].iloc[g])
                    pidx.append(j)
                    geoms.append(blob)
            yield pd.DataFrame({id_col: ids, "part_idx": pidx,
                                "geometry": geoms})

    return df.select(id_col, geom_col).mapInPandas(gen, schema=schema)


def _reemit_parts(single) -> list:
    parts = []
    for p in range(single.geom_part_off[0], single.geom_part_off[1]):
        k = int(single.part_kind[p])
        rings = []
        for ri in range(single.part_ring_off[p], single.part_ring_off[p + 1]):
            s, e = single.ring_coord_off[ri], single.ring_coord_off[ri + 1]
            rings.append(single.coords[s:e])
        if k == W.KIND_POINT and rings:
            parts.append(W.point_to_wkb(rings[0][0][0], rings[0][0][1]))
        elif k == W.KIND_LINESTRING and rings:
            parts.append(W.linestring_to_wkb(rings[0]))
        elif k == W.KIND_POLYGON:
            parts.append(W.polygon_to_wkb(rings))
    return parts


def subdivide_by_cells(df: DataFrame, *, level: int,
                       geom_col: str = "geometry",
                       id_col: str = "doc_id") -> DataFrame:
    """ST_SubDivideExplode-shaped work-unit split
    (``cdap_geo/sedona.py:80-85``): one row per (geometry, covering
    cell) with the cell box as the clip window — each row is a bounded
    work unit for downstream kernels (the skew remedy for huge
    polygons)."""
    from cdap_geo_spark.operators.sjoin import _index_side
    idx = _index_side(df, id_col, geom_col, level, "intersects", 1.0,
                      keep_geom=True)
    return idx.select(id_col, geom_col, "cell_id")


# ---------------------------------------------------------------------------
# sort keys / headers
# ---------------------------------------------------------------------------

def st_sort_key(max_level: int = 16):
    """WKB -> int64 coarsest-cell-containing-bbox id — the geohash
    common-prefix trick (``cdap_geo/index_geohash.py:15-29``) on Z-order
    cells; used as a range-partition / file-sort key."""
    @pandas_udf(T.LongType())
    def _key(s: pd.Series) -> pd.Series:
        batch = W.parse_wkb([None if v is None else bytes(v) for v in s])
        b = batch.bounds()
        out = np.zeros(len(batch), np.int64)
        bad = np.isnan(b[:, 0])
        cs = C.cell_size(max_level)
        x0 = np.clip(((b[:, 0] - C.WORLD_X0) // cs), 0,
                     (1 << max_level) - 1).astype(np.int64)
        y0 = np.clip(((b[:, 1] - C.WORLD_Y0) // cs), 0,
                     (1 << max_level) - 1).astype(np.int64)
        x1 = np.clip(((b[:, 2] - C.WORLD_X0) // cs), 0,
                     (1 << max_level) - 1).astype(np.int64)
        y1 = np.clip(((b[:, 3] - C.WORLD_Y0) // cs), 0,
                     (1 << max_level) - 1).astype(np.int64)
        # walk up levels until the min and max corners share a cell
        lvl = np.full(len(batch), max_level, np.int64)
        while True:
            same = (x0 == x1) & (y0 == y1)
            if same.all():
                break
            shrink = ~same
            x0[shrink] >>= 1
            x1[shrink] >>= 1
            y0[shrink] >>= 1
            y1[shrink] >>= 1
            lvl[shrink] -= 1
        ids = C.encode_mixed(lvl, x0, y0)
        res = pd.Series(ids.astype(object))
        res[bad] = None
        return res
    return _key


GPB_HEADER_TYPE = T.StructType([
    T.StructField("magic", T.StringType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("flags", T.IntegerType()),
    T.StructField("srs_id", T.IntegerType()),
    T.StructField("envelope", T.ArrayType(T.DoubleType())),
])


def unpack_gpb_header():
    """GeoPackage blob header -> struct (``cdap_geo/read.py:51-71``):
    magic 'GP', version, flags, srs_id, optional envelope doubles.
    Batch ``np.frombuffer`` unpack, no per-row struct module calls."""
    @pandas_udf(GPB_HEADER_TYPE)
    def _hdr(s: pd.Series) -> pd.DataFrame:
        rows = []
        for blob in s:
            if blob is None or len(blob) < 8:
                rows.append((None, None, None, None, None))
                continue
            blob = bytes(blob)
            magic = blob[:2].decode("ascii", "replace")
            version = blob[2]
            flags = blob[3]
            srs = int.from_bytes(blob[4:8], "little", signed=True)
            env_ind = (flags >> 1) & 0x7
            n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_ind, 0)
            env = None
            if n_env and len(blob) >= 8 + 8 * n_env:
                env = np.frombuffer(blob, "<f8", count=n_env,
                                    offset=8).tolist()
            rows.append((magic, version, flags, srs, env))
        return pd.DataFrame(rows, columns=["magic", "version", "flags",
                                           "srs_id", "envelope"])
    return _hdr
