"""GeoJSON source/sink (RFC 7946) — beyond the reference, which
ingests GPKG + Esri REST JSON only (``cdap_geo/read.py``,
``remotes.py``); GeoJSON is the remaining interchange format a
port-over user actually meets.

Reader: distributed over files/lines, geometry assembled into WKB by
the engine's own codec (``core/wkb.py``) inside one ``mapInPandas``
pass — properties are kept as a JSON string column (schema-free;
pull typed fields natively with ``F.get_json_object`` /
``F.from_json``, the Spark-idiomatic path).

Writer: the Feature line is assembled NATIVELY — properties via
``F.to_json(F.struct(...))``, the line via ``F.concat`` — only the
geometry->GeoJSON serialization crosses into Python (Arrow batch).

Scale: newline-delimited GeoJSON (one Feature per line) splits by
line ranges like any text source — preferred at 100 TB.
FeatureCollection files are one row per FILE (``wholetext``): they
parallelize across files but never within one file; the reader
handles both, the writer only emits the splittable form.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cdap_geo_spark.core import wkb as W


# ---------------------------------------------------------------------------
# geometry converters (dict <-> WKB via the engine codec)
# ---------------------------------------------------------------------------

def geojson_geometry_to_wkb(geom: dict | None) -> bytes | None:
    """GeoJSON geometry object -> WKB. Unknown/empty -> None.

    Coordinates beyond (x, y) (altitude) are dropped — same Force2D
    normalization the WKB decoder applies everywhere else.
    """
    if not geom or "type" not in geom:
        return None
    t = geom["type"]
    if t == "GeometryCollection":
        blobs = [geojson_geometry_to_wkb(g)
                 for g in geom.get("geometries", [])]
        blobs = [b for b in blobs if b is not None]
        return W.multi_to_wkb(W.KIND_COLLECTION, blobs) if blobs else None
    c = geom.get("coordinates")
    if c is None or (isinstance(c, (list, tuple)) and len(c) == 0):
        return None
    if t == "Point":
        return W.point_to_wkb(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        pts = np.asarray([p[:2] for p in c], float)
        blobs = W.points_to_wkb(pts[:, 0], pts[:, 1])
        return W.multi_to_wkb(W.KIND_MULTIPOINT, blobs)
    if t == "LineString":
        return W.linestring_to_wkb(np.asarray([p[:2] for p in c], float))
    if t == "MultiLineString":
        lines = [W.linestring_to_wkb(np.asarray([p[:2] for p in s], float))
                 for s in c if len(s) >= 2]
        return (W.multi_to_wkb(W.KIND_MULTILINESTRING, lines)
                if lines else None)
    if t == "Polygon":
        rings = [np.asarray([p[:2] for p in r], float)
                 for r in c if len(r) >= 4]
        return W.polygon_to_wkb(rings) if rings else None
    if t == "MultiPolygon":
        polys = []
        for poly in c:
            rings = [np.asarray([p[:2] for p in r], float)
                     for r in poly if len(r) >= 4]
            if rings:
                polys.append(W.polygon_to_wkb(rings))
        return W.multi_to_wkb(W.KIND_MULTIPOLYGON, polys) if polys else None
    return None


def _coords_json(arr: np.ndarray) -> str:
    return "[" + ",".join(
        f"[{repr(float(x))},{repr(float(y))}]" for x, y in arr) + "]"


def wkb_to_geojson_geometry(blob) -> str | None:
    """WKB -> GeoJSON geometry JSON string (floats in shortest
    round-trip repr, so a write->read cycle reproduces the WKB
    bit-for-bit for 2D geometries). Multi*/collection members are the
    batch codec's flattened parts: a GeometryCollection round-trips
    its atomic parts (content-equal, nesting not preserved)."""
    if blob is None:
        return None
    b = W.parse_wkb([bytes(blob)])
    if not len(b) or not b.valid[0]:
        return None
    kind = int(b.kinds[0])
    parts = range(b.geom_part_off[0], b.geom_part_off[1])

    def ring_coords(p):
        out = []
        for r in range(b.part_ring_off[p], b.part_ring_off[p + 1]):
            c0, c1 = b.ring_coord_off[r], b.ring_coord_off[r + 1]
            out.append(b.coords[c0:c1])
        return out

    def part_json(p):
        pk = int(b.part_kind[p])
        rc = ring_coords(p)
        if pk == W.KIND_POINT:
            x, y = rc[0][0]
            return "Point", f"[{repr(float(x))},{repr(float(y))}]"
        if pk == W.KIND_LINESTRING:
            return "LineString", _coords_json(rc[0])
        return "Polygon", "[" + ",".join(_coords_json(r) for r in rc) + "]"

    if kind in (W.KIND_POINT, W.KIND_LINESTRING, W.KIND_POLYGON):
        t, cj = part_json(int(b.geom_part_off[0]))
        return f'{{"type":"{t}","coordinates":{cj}}}'
    if kind in (W.KIND_MULTIPOINT, W.KIND_MULTILINESTRING,
                W.KIND_MULTIPOLYGON):
        t = {W.KIND_MULTIPOINT: "MultiPoint",
             W.KIND_MULTILINESTRING: "MultiLineString",
             W.KIND_MULTIPOLYGON: "MultiPolygon"}[kind]
        cj = ",".join(part_json(p)[1] for p in parts)
        return f'{{"type":"{t}","coordinates":[{cj}]}}'
    # collection of mixed atomic parts
    gj = ",".join(f'{{"type":"{t}","coordinates":{cj}}}'
                  for t, cj in (part_json(p) for p in parts))
    return f'{{"type":"GeometryCollection","geometries":[{gj}]}}'


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_READ_SCHEMA = T.StructType([
    T.StructField("feature_id", T.StringType()),
    T.StructField("geometry", T.BinaryType()),
    T.StructField("properties", T.StringType()),
])


def _features_to_rows(features):
    import pandas as pd
    ids, geoms, props = [], [], []
    for f in features:
        if not isinstance(f, dict) or f.get("type") != "Feature":
            continue
        fid = f.get("id")
        ids.append(None if fid is None else str(fid))
        geoms.append(geojson_geometry_to_wkb(f.get("geometry")))
        props.append(json.dumps(f.get("properties") or {},
                                separators=(",", ":"), sort_keys=True))
    return pd.DataFrame({"feature_id": pd.Series(ids, dtype=object),
                         "geometry": pd.Series(geoms, dtype=object),
                         "properties": pd.Series(props, dtype=object)})


def read_geojson(spark: SparkSession, path: str, *,
                 lines: bool | str = "auto") -> DataFrame:
    """(feature_id, geometry WKB, properties JSON-string) from GeoJSON.

    ``lines=True``: newline-delimited Features (one per line —
    splittable, the 100 TB layout). ``lines=False``: whole
    FeatureCollection file(s) (parallel across files only).
    ``'auto'`` probes the first line (bounded: one row).
    """
    if lines == "auto":
        head = spark.read.text(path).limit(1).collect()
        first = head[0][0].strip() if head else ""
        lines = first.startswith("{") and '"FeatureCollection"' not in first

    if lines:
        src = spark.read.text(path)

        def gen(batches):
            for pdf in batches:
                feats = []
                for line in pdf["value"]:
                    line = line.strip().rstrip(",")
                    if not line or line in ("[", "]", "{", "}"):
                        continue
                    try:
                        feats.append(json.loads(line))
                    except ValueError:
                        continue
                yield _features_to_rows(feats)

        return src.mapInPandas(gen, schema=_READ_SCHEMA)

    src = spark.read.text(path, wholetext=True)

    def gen_whole(batches):
        for pdf in batches:
            for doc in pdf["value"]:
                obj = json.loads(doc)
                if obj.get("type") == "FeatureCollection":
                    yield _features_to_rows(obj.get("features", []))
                elif obj.get("type") == "Feature":
                    yield _features_to_rows([obj])

    return src.mapInPandas(gen_whole, schema=_READ_SCHEMA)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def geojson_feature_column(df: DataFrame, *,
                           geom_col: str = "geometry") -> F.Column:
    """One GeoJSON Feature JSON string per row: properties = every
    non-geometry column via native ``to_json(struct(...))``; only the
    geometry serialization runs in Python (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf(T.StringType())
    def _geom_json(blobs: pd.Series) -> pd.Series:
        return pd.Series([wkb_to_geojson_geometry(b) for b in blobs],
                         dtype=object)

    others = [c for c in df.columns if c != geom_col]
    props = F.to_json(F.struct(*[F.col(c) for c in others])) if others \
        else F.lit("{}")
    return F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(_geom_json(F.col(geom_col)), F.lit("null")),
        F.lit(',"properties":'), props, F.lit("}"))


def write_geojson(df: DataFrame, path: str, *,
                  geom_col: str = "geometry", mode: str = "error") -> None:
    """Write newline-delimited GeoJSON Features (the splittable
    layout; read back with ``read_geojson(..., lines=True)``)."""
    out = df.select(geojson_feature_column(df, geom_col=geom_col)
                    .alias("value"))
    out.write.mode(mode).text(path)
