"""EPSG:27700 reprojection: published OS test vectors + round-trips.

The reference's whole pipeline defaults to crs_to=27700
(``cdap_geo/functions.py:30-35``, ``sedona.py:60-66``); these tests pin
the closed-form replacement (``core/proj.py``) to the Ordnance Survey
worked examples.
"""

import numpy as np
import pytest

from cdap_geo_spark.core import proj as P

# OS guide worked example station: OSGB36 geodetic <-> national grid
_OS_LAT = 52 + 39 / 60 + 27.2531 / 3600
_OS_LON = 1 + 43 / 60 + 4.5177 / 3600
_OS_E, _OS_N = 651409.903, 313177.270
# same station in ETRS89/WGS84 (OS guide datum-change example)
_ET_LAT = 52 + 39 / 60 + 28.8282 / 3600
_ET_LON = 1 + 42 / 60 + 57.8663 / 3600


def test_projection_core_exact_vs_os_vector():
    E, N = P.osgb36_to_en(np.array([_OS_LAT]), np.array([_OS_LON]))
    assert E[0] == pytest.approx(_OS_E, abs=1e-3)
    assert N[0] == pytest.approx(_OS_N, abs=1e-3)


def test_projection_inverse_roundtrip():
    E, N = P.osgb36_to_en(np.array([_OS_LAT]), np.array([_OS_LON]))
    lat, lon = P.en_to_osgb36(E, N)
    assert lat[0] == pytest.approx(_OS_LAT, abs=1e-8)
    assert lon[0] == pytest.approx(_OS_LON, abs=1e-8)


def test_wgs84_datum_shift_within_single_helmert_accuracy():
    # OS quotes ~3.5 m for the single-set Helmert vs the OSTN grid
    E, N = P.wgs84_to_en(np.array([_ET_LAT]), np.array([_ET_LON]))
    assert abs(E[0] - _OS_E) < 5.0
    assert abs(N[0] - _OS_N) < 5.0


def test_wgs84_roundtrip_property():
    rng = np.random.RandomState(5)
    lats = rng.uniform(49.8, 60.0, 200)
    lons = rng.uniform(-7.5, 1.7, 200)
    E, N = P.wgs84_to_en(lats, lons)
    la2, lo2 = P.en_to_wgs84(E, N)
    # 1e-7 deg ~ 1 cm — far inside the <=1 m gate
    assert np.abs(la2 - lats).max() < 1e-7
    assert np.abs(lo2 - lons).max() < 1e-7


def test_webmerc_roundtrip():
    rng = np.random.RandomState(6)
    lons = rng.uniform(-179, 179, 100)
    lats = rng.uniform(-84, 84, 100)
    mx, my = P.lonlat_to_webmerc(lons, lats)
    lo2, la2 = P.webmerc_to_lonlat(mx, my)
    assert np.abs(lo2 - lons).max() < 1e-9
    assert np.abs(la2 - lats).max() < 1e-9


def test_compat_crs_default_pair_works(spark):
    """Round-1 regression: compat.crs raised on its own DEFAULT args
    (crs_to=27700). Now the reference's default call must work."""
    from pyspark.sql import functions as F

    import cdap_geo_spark.compat as compat
    from cdap_geo_spark.core import wkb as W

    blob = W.point_to_wkb(_ET_LON, _ET_LAT)  # WKB order: (x=lon, y=lat)
    df = spark.createDataFrame([(bytearray(blob),)], "geometry binary")
    out = df.select(compat.crs("geometry", 4326).alias("g"))
    got = W.parse_wkb([bytes(out.collect()[0].g)])
    assert got.coords[0, 0] == pytest.approx(_OS_E, abs=5.0)
    assert got.coords[0, 1] == pytest.approx(_OS_N, abs=5.0)

    # chained pair: 27700 -> 3857 routes through 4326
    out2 = df.select(compat.crs(compat.crs("geometry", 4326), 27700,
                                crs_to=3857).alias("g"))
    got2 = W.parse_wkb([bytes(out2.collect()[0].g)])
    mx, my = P.lonlat_to_webmerc(np.array([_ET_LON]), np.array([_ET_LAT]))
    assert got2.coords[0, 0] == pytest.approx(mx[0], abs=10.0)
    assert got2.coords[0, 1] == pytest.approx(my[0], abs=10.0)
