"""Distributed GeoPackage reader — stdlib sqlite3, rowid-range tasks.

The reference reads a GeoPackage through Spark's JDBC source plus a
hand-registered sqlite dialect (``cdap_geo/read.py:76-106``), then
splits a FIXED 40-byte GPB header off the ``geom`` blob — which is
only correct for the xy-envelope flavor of the header. This module
keeps the reference's semantics (feature table -> DataFrame with
``gpd_header`` struct + ``geometry`` WKB) but plans the scan itself:

* the driver opens the file once (read-only) for metadata: layer list
  from ``gpkg_contents``, geometry column from
  ``gpkg_geometry_columns``, Spark schema from ``PRAGMA table_info``
  (same type mapping as the reference's GeoPackageDialect,
  ``read.py:23-45``), and the rowid span;
* the rowid span is split into ``num_partitions`` ranges — rowid is
  sqlite's clustered key, so each range is one contiguous B-tree
  sweep, the moral equivalent of JDBC's partitionColumn/lowerBound/
  upperBound parallel read;
* each task opens the file independently (``mode=ro&immutable=1``) and
  scans only its range via ``mapInPandas`` — no driver collect, no
  single-task bottleneck. On a real cluster this requires the .gpkg on
  shared storage, exactly like the reference's ``jdbc:sqlite:`` URL;
* the GPB header is parsed per its flags byte (envelope indicator ->
  0/4/6/8 doubles), so all header flavors split correctly, not just
  the 40-byte one.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

GPB_HEADER_TYPE = T.StructType([
    T.StructField("magic", T.StringType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("flags", T.IntegerType()),
    T.StructField("srs_id", T.IntegerType()),
    T.StructField("envelope", T.ArrayType(T.DoubleType())),
])

# sqlite declared type -> Spark type: the reference's GeoPackageDialect
# mapping (cdap_geo/read.py:23-45) re-expressed driver-side.
_GEOM_TYPES = {
    "GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
    "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE",
    "MULTISURFACE", "CURVE", "SURFACE",
}
_TYPE_MAP = {
    "BOOLEAN": T.BooleanType(), "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(), "MEDIUMINT": T.IntegerType(),
    "INT": T.LongType(), "INTEGER": T.LongType(),
    "FLOAT": T.FloatType(), "DOUBLE": T.DoubleType(),
    "REAL": T.DoubleType(), "TEXT": T.StringType(),
    "BLOB": T.BinaryType(), "DATE": T.DateType(),
    "DATETIME": T.StringType(),
}


def _connect_ro(filepath: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{filepath}?mode=ro&immutable=1",
                           uri=True)


def list_layers(filepath: str) -> list:
    """Feature layers registered in ``gpkg_contents`` (the reference
    uses ``fiona.listlayers``, read.py:9,98)."""
    with _connect_ro(filepath) as con:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name"
        ).fetchall()
    return [r[0] for r in rows]


def _sqlite_to_spark(decl: str) -> T.DataType:
    decl = (decl or "").strip().upper()
    if decl in _GEOM_TYPES:
        return T.BinaryType()
    return _TYPE_MAP.get(decl, T.StringType())


def _split_gpb(blob):
    """(header_struct_tuple, wkb_bytes) — header length from the flags
    envelope-indicator bits, not a fixed 40."""
    if blob is None or len(blob) < 8:
        return (None, None, None, None, None), None
    blob = bytes(blob)
    magic = blob[:2].decode("ascii", "replace")
    version = blob[2]
    flags = blob[3]
    srs = int.from_bytes(blob[4:8], "little", signed=True)
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get((flags >> 1) & 0x7, 0)
    hlen = 8 + 8 * n_env
    env = None
    if n_env and len(blob) >= hlen:
        import numpy as np
        env = np.frombuffer(blob, "<f8", count=n_env, offset=8).tolist()
    return (magic, version, flags, srs, env), blob[hlen:]


def read_gpkg(spark: SparkSession, filepath: str, layer=None, *,
              num_partitions: int | None = None) -> DataFrame:
    """GeoPackage feature layer -> DataFrame (``cdap_geo/read.py:85``).

    Output: every non-geometry column with its mapped Spark type, plus
    ``gpd_header`` (magic/version/flags/srs_id/envelope) and
    ``geometry`` (the GPB payload = standard WKB) — the same shape the
    reference produces, minus its fixed-40-byte-header assumption.

    ``layer`` may be a name, an integer index into :func:`list_layers`
    (the reference's convention), or None for layer 0.
    """
    filepath = os.path.abspath(filepath)
    if layer is None:
        layer = 0
    if isinstance(layer, int):
        layers = list_layers(filepath)
        if not layers:
            raise ValueError(f"no feature layers in {filepath}")
        layer = layers[layer]

    with _connect_ro(filepath) as con:
        geom_col = None
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,)).fetchone()
        if row:
            geom_col = row[0]
        info = con.execute(
            f'PRAGMA table_info("{layer}")').fetchall()
        if not info:
            raise ValueError(f"layer {layer!r} not found in {filepath}")
        span = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{layer}"').fetchone()

    cols = [(name, decl) for _, name, decl, *_ in info]
    if geom_col is None:
        for name, decl in cols:
            if (decl or "").strip().upper() in _GEOM_TYPES:
                geom_col = name
                break
    attr_cols = [name for name, _ in cols if name != geom_col]
    fields = [T.StructField(name, _sqlite_to_spark(decl), True)
              for name, decl in cols if name != geom_col]
    if geom_col is not None:
        fields.append(T.StructField("gpd_header", GPB_HEADER_TYPE, True))
        fields.append(T.StructField("geometry", T.BinaryType(), True))
    schema = T.StructType(fields)

    lo, hi = span
    if lo is None:  # empty layer
        return spark.createDataFrame([], schema)

    n = num_partitions or min(spark.sparkContext.defaultParallelism,
                              max(1, (hi - lo + 1) // 64 + 1))
    step = (hi - lo + 1 + n - 1) // n
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
              for i in range(n) if lo + i * step <= hi]
    bounds = spark.createDataFrame(ranges, "lo long, hi long") \
        .repartition(len(ranges))

    select_cols = ", ".join(f'"{c}"' for c in attr_cols)
    if geom_col is not None:
        select_cols = (select_cols + ", " if select_cols else "") \
            + f'"{geom_col}"'
    sql = (f'SELECT {select_cols} FROM "{layer}" '
           f"WHERE rowid >= ? AND rowid <= ?")
    out_names = [f.name for f in fields]
    has_geom = geom_col is not None

    def _scan(batches):
        con = _connect_ro(filepath)
        try:
            for pdf in batches:
                for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                    rows = con.execute(sql, (int(lo_), int(hi_))) \
                        .fetchall()
                    if not rows:
                        continue
                    if has_geom:
                        recs = []
                        for r in rows:
                            hdr, wkb = _split_gpb(r[-1])
                            recs.append((*r[:-1], hdr, wkb))
                    else:
                        recs = rows
                    yield pd.DataFrame.from_records(recs,
                                                    columns=out_names)
        finally:
            con.close()

    return bounds.mapInPandas(_scan, schema)


def read_gpkgs(spark: SparkSession, path: str, suffix: str = ".gpkg",
               layer=None, **kwargs) -> DataFrame:
    """First ``*{suffix}`` file under ``path`` -> :func:`read_gpkg`
    (the reference's directory convenience, read.py:109-114, which
    also reads only the first match)."""
    for f in sorted(os.listdir(path)):
        if f.endswith(suffix):
            return read_gpkg(spark, os.path.join(path, f), layer,
                             **kwargs)
    raise FileNotFoundError(f"no {suffix} file under {path}")
