"""Closed-form CRS math: EPSG:27700 (British National Grid), EPSG:4326,
EPSG:3857 — vectorized NumPy, no pyproj.

The reference delegates reprojection to pyproj with ``crs_to=27700`` as
the DEFAULT (``cdap_geo/functions.py:30-35``, ``sedona.py:60-66``);
this module supplies the same pairs from the published Ordnance Survey
formulae ("A guide to coordinate systems in Great Britain", OS, public
domain constants):

* transverse Mercator projection on the Airy 1830 ellipsoid with the
  OSGB36 national-grid parameters (true origin 49N 2W, F0, E0/N0);
* WGS84 <-> OSGB36 datum change via the standard 7-parameter Helmert
  transformation (small-angle form) through geocentric cartesian
  coordinates.

Accuracy: the projection core is exact to <1 mm against the OS worked
example; the Helmert datum shift is the published single-set
approximation (OS quotes ~3.5 m vs the definitive OSTN grid — same
class as any non-grid pyproj pipeline).
"""

from __future__ import annotations

import numpy as np

# Airy 1830 ellipsoid + national grid parameters (OS guide, annexe A/B)
_AIRY_A = 6_377_563.396
_AIRY_B = 6_356_256.909
_F0 = 0.9996012717
_LAT0 = np.radians(49.0)
_LON0 = np.radians(-2.0)
_E0 = 400_000.0
_N0 = -100_000.0

# WGS84 / GRS80 ellipsoid
_WGS_A = 6_378_137.0
_WGS_F = 1.0 / 298.257223563
_WGS_B = _WGS_A * (1.0 - _WGS_F)

# WGS84 -> OSGB36 Helmert parameters (OS guide §6.6): metres, ppm,
# arc-seconds (small-angle convention)
_HELMERT_W2O = (-446.448, 125.157, -542.060,
                20.4894e-6,
                np.radians(-0.1502 / 3600.0),
                np.radians(-0.2470 / 3600.0),
                np.radians(-0.8421 / 3600.0))


def _merid_arc(phi: np.ndarray) -> np.ndarray:
    """Developed meridional arc M (OS guide C.2.3)."""
    n = (_AIRY_A - _AIRY_B) / (_AIRY_A + _AIRY_B)
    n2, n3 = n * n, n * n * n
    dphi, sphi = phi - _LAT0, phi + _LAT0
    return _AIRY_B * _F0 * (
        (1 + n + 1.25 * n2 + 1.25 * n3) * dphi
        - (3 * n + 3 * n2 + 2.625 * n3) * np.sin(dphi) * np.cos(sphi)
        + (1.875 * n2 + 1.875 * n3) * np.sin(2 * dphi) * np.cos(2 * sphi)
        - (35.0 / 24.0) * n3 * np.sin(3 * dphi) * np.cos(3 * sphi))


def osgb36_to_en(lat_deg: np.ndarray, lon_deg: np.ndarray):
    """OSGB36 geodetic -> national grid easting/northing (OS C.1)."""
    phi = np.radians(np.asarray(lat_deg, np.float64))
    lam = np.radians(np.asarray(lon_deg, np.float64))
    e2 = 1.0 - (_AIRY_B * _AIRY_B) / (_AIRY_A * _AIRY_A)
    s, c, t = np.sin(phi), np.cos(phi), np.tan(phi)
    nu = _AIRY_A * _F0 / np.sqrt(1 - e2 * s * s)
    rho = _AIRY_A * _F0 * (1 - e2) / (1 - e2 * s * s) ** 1.5
    eta2 = nu / rho - 1.0
    M = _merid_arc(phi)
    I = M + _N0
    II = nu / 2.0 * s * c
    III = nu / 24.0 * s * c ** 3 * (5 - t * t + 9 * eta2)
    IIIA = nu / 720.0 * s * c ** 5 * (61 - 58 * t * t + t ** 4)
    IV = nu * c
    V = nu / 6.0 * c ** 3 * (nu / rho - t * t)
    VI = nu / 120.0 * c ** 5 * (5 - 18 * t * t + t ** 4
                                + 14 * eta2 - 58 * t * t * eta2)
    dl = lam - _LON0
    N = I + II * dl ** 2 + III * dl ** 4 + IIIA * dl ** 6
    E = _E0 + IV * dl + V * dl ** 3 + VI * dl ** 5
    return E, N


def en_to_osgb36(E: np.ndarray, N: np.ndarray):
    """National grid easting/northing -> OSGB36 geodetic (OS C.2)."""
    E = np.asarray(E, np.float64)
    N = np.asarray(N, np.float64)
    e2 = 1.0 - (_AIRY_B * _AIRY_B) / (_AIRY_A * _AIRY_A)
    phi = _LAT0 + (N - _N0) / (_AIRY_A * _F0)
    for _ in range(8):
        M = _merid_arc(phi)
        delta = N - _N0 - M
        phi = phi + delta / (_AIRY_A * _F0)
        if np.all(np.abs(delta) < 1e-5):
            break
    s, c, t = np.sin(phi), np.cos(phi), np.tan(phi)
    nu = _AIRY_A * _F0 / np.sqrt(1 - e2 * s * s)
    rho = _AIRY_A * _F0 * (1 - e2) / (1 - e2 * s * s) ** 1.5
    eta2 = nu / rho - 1.0
    VII = t / (2 * rho * nu)
    VIII = t / (24 * rho * nu ** 3) * (5 + 3 * t * t + eta2
                                       - 9 * t * t * eta2)
    IX = t / (720 * rho * nu ** 5) * (61 + 90 * t * t + 45 * t ** 4)
    X = 1.0 / (c * nu)
    XI = 1.0 / (c * 6 * nu ** 3) * (nu / rho + 2 * t * t)
    XII = 1.0 / (c * 120 * nu ** 5) * (5 + 28 * t * t + 24 * t ** 4)
    XIIA = 1.0 / (c * 5040 * nu ** 7) * (61 + 662 * t * t
                                         + 1320 * t ** 4 + 720 * t ** 6)
    de = E - _E0
    lat = phi - VII * de ** 2 + VIII * de ** 4 - IX * de ** 6
    lon = _LON0 + X * de - XI * de ** 3 + XII * de ** 5 - XIIA * de ** 7
    return np.degrees(lat), np.degrees(lon)


def _geodetic_to_cart(lat_deg, lon_deg, a, b):
    phi = np.radians(np.asarray(lat_deg, np.float64))
    lam = np.radians(np.asarray(lon_deg, np.float64))
    e2 = 1.0 - (b * b) / (a * a)
    s = np.sin(phi)
    nu = a / np.sqrt(1 - e2 * s * s)
    x = nu * np.cos(phi) * np.cos(lam)
    y = nu * np.cos(phi) * np.sin(lam)
    z = nu * (1 - e2) * s
    return x, y, z


def _cart_to_geodetic(x, y, z, a, b):
    e2 = 1.0 - (b * b) / (a * a)
    p = np.sqrt(x * x + y * y)
    phi = np.arctan2(z, p * (1 - e2))
    for _ in range(10):
        s = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * s * s)
        phi_new = np.arctan2(z + e2 * nu * s, p)
        if np.all(np.abs(phi_new - phi) < 1e-12):
            phi = phi_new
            break
        phi = phi_new
    return np.degrees(phi), np.degrees(np.arctan2(y, x))


def _helmert(x, y, z, params, inverse: bool = False):
    tx, ty, tz, s, rx, ry, rz = params
    if inverse:
        tx, ty, tz, s, rx, ry, rz = -tx, -ty, -tz, -s, -rx, -ry, -rz
    m = 1.0 + s
    x2 = tx + m * x - rz * y + ry * z
    y2 = ty + rz * x + m * y - rx * z
    z2 = tz - ry * x + rx * y + m * z
    return x2, y2, z2


def wgs84_to_en(lat_deg, lon_deg):
    """EPSG:4326 -> EPSG:27700 (Helmert datum change + TM projection)."""
    x, y, z = _geodetic_to_cart(lat_deg, lon_deg, _WGS_A, _WGS_B)
    x, y, z = _helmert(x, y, z, _HELMERT_W2O)
    lat, lon = _cart_to_geodetic(x, y, z, _AIRY_A, _AIRY_B)
    return osgb36_to_en(lat, lon)


def en_to_wgs84(E, N):
    """EPSG:27700 -> EPSG:4326."""
    lat, lon = en_to_osgb36(E, N)
    x, y, z = _geodetic_to_cart(lat, lon, _AIRY_A, _AIRY_B)
    x, y, z = _helmert(x, y, z, _HELMERT_W2O, inverse=True)
    return _cart_to_geodetic(x, y, z, _WGS_A, _WGS_B)


_R = 6_378_137.0  # WGS84 spherical radius (web-mercator convention)


def lonlat_to_webmerc(lon, lat):
    mx = np.radians(np.asarray(lon, np.float64)) * _R
    my = _R * np.log(np.tan(np.pi / 4
                            + np.radians(np.asarray(lat, np.float64)) / 2))
    return mx, my


def webmerc_to_lonlat(mx, my):
    lon = np.degrees(np.asarray(mx, np.float64) / _R)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(my, np.float64) / _R))
                     - np.pi / 2)
    return lon, lat
