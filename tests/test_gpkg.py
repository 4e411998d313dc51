"""Distributed GeoPackage reader (sources/gpkg.py) vs a synthetic
.gpkg built with stdlib sqlite3 — the same tables a real GeoPackage
carries (gpkg_contents, gpkg_geometry_columns, feature layer with
GPB-wrapped WKB)."""

import sqlite3
import struct

import numpy as np
import pytest

from cdap_geo_spark.core import wkb as W
from cdap_geo_spark.sources import gpkg as G


def _gpb(wkb: bytes, srs_id: int = 27700, envelope=None) -> bytes:
    """GeoPackage binary header (spec §2.1.3): magic GP, version 0,
    flags (envelope indicator in bits 1-3), srs_id, envelope, payload."""
    if envelope is None:
        flags = 0b00000001  # LE byte order, no envelope
        env = b""
    else:
        flags = 0b00000011  # LE, xy envelope
        env = struct.pack("<4d", *envelope)
    return b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id) \
        + env + wkb


@pytest.fixture()
def gpkg_file(tmp_path):
    path = str(tmp_path / "fixture.gpkg")
    con = sqlite3.connect(path)
    con.executescript("""
        CREATE TABLE gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT,
            identifier TEXT, srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
            table_name TEXT, column_name TEXT, geometry_type_name TEXT,
            srs_id INTEGER, z TINYINT, m TINYINT);
        CREATE TABLE parcels (
            fid INTEGER PRIMARY KEY, name TEXT, value DOUBLE,
            geom POINT);
        INSERT INTO gpkg_contents VALUES
            ('parcels', 'features', 'parcels', 27700),
            ('notes', 'attributes', 'notes', 0);
        INSERT INTO gpkg_geometry_columns VALUES
            ('parcels', 'geom', 'POINT', 27700, 0, 0);
    """)
    rows = []
    for i in range(257):
        wkb = W.point_to_wkb(float(i), float(2 * i))
        env = (float(i), float(i), float(2 * i), float(2 * i))
        blob = _gpb(wkb, envelope=env if i % 2 == 0 else None)
        rows.append((i + 1, f"p{i}", i * 1.5, blob))
    con.executemany("INSERT INTO parcels VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()
    return path


def test_list_layers(gpkg_file):
    assert G.list_layers(gpkg_file) == ["parcels"]


def test_read_gpkg_roundtrip(gpkg_file, spark):
    sdf = G.read_gpkg(spark, gpkg_file, num_partitions=5)
    assert [f.name for f in sdf.schema.fields] == \
        ["fid", "name", "value", "gpd_header", "geometry"]
    assert dict((f.name, f.dataType.simpleString())
                for f in sdf.schema.fields)["fid"] == "bigint"
    pdf = sdf.toPandas().sort_values("fid").reset_index(drop=True)
    assert len(pdf) == 257
    # geometry is the bare WKB (header stripped at its true length,
    # which differs row to row: 8 bytes vs 40 bytes)
    batch = W.parse_wkb([bytes(b) for b in pdf.geometry])
    assert batch.coords[:, 0].tolist() == [float(i) for i in range(257)]
    hdr0, hdr1 = pdf.gpd_header[0], pdf.gpd_header[1]
    assert hdr0["magic"] == "GP" and hdr0["srs_id"] == 27700
    assert list(hdr0["envelope"]) == [0.0, 0.0, 0.0, 0.0]
    assert hdr1["envelope"] is None  # odd rows wrote no envelope
    assert pdf.name[10] == "p10" and pdf.value[10] == 15.0


def test_read_gpkg_layer_by_index_and_partitioning(gpkg_file, spark):
    sdf = G.read_gpkg(spark, gpkg_file, layer=0, num_partitions=8)
    assert sdf.rdd.getNumPartitions() == 8
    assert sdf.count() == 257


def test_read_gpkgs_dir(gpkg_file, spark, tmp_path):
    assert G.read_gpkgs(spark, str(tmp_path)).count() == 257
    with pytest.raises(FileNotFoundError):
        G.read_gpkgs(spark, str(tmp_path), suffix=".nope")
