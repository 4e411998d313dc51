"""OS Download API catalog helpers (``cdap_geo/os.py:53-73``).

The reference goes through ``osdatahub.DataPackageDownload.all_products``
then tidies with pandas; neither osdatahub nor network exist here, so
the HTTP call sits behind the same injectable ``fetch`` seam as the
ArcGIS reader and the pandas shaping is reproduced exactly
(json_normalize of ``versions`` with ``version-`` prefix, latest-first
groupby, ``supplyType == 'Full'`` filter).
"""

from __future__ import annotations

import pandas as pd

from cdap_geo_spark.sources.arcgis import default_fetch

PACKAGES_URL = "https://api.os.uk/downloads/v1/dataPackages?key={key}"


def dl_packages(key: str, fetch=default_fetch) -> pd.DataFrame:
    """Catalog -> one row per (package, version) — the reference's
    ``pd.json_normalize(..., 'versions', record_prefix='version-')``
    shape (``os.py:54-59``)."""
    products = fetch(PACKAGES_URL.format(key=key))
    return pd.json_normalize(
        products, "versions", record_prefix="version-",
        meta=["id", "name", "url", "createdOn", "productId",
              "productName"])


def dl_packages_tidied(key: str, latest: bool = True, full: bool = True,
                       fetch=default_fetch) -> pd.DataFrame:
    """``os.py:62-73``: rename to the tidy schema, newest version
    first, optionally keep only each product's latest and only Full
    supplies."""
    cols_old = ["id", "version-id", "version-createdOn",
                "version-supplyType", "version-reason", "version-format",
                "productId", "productName", "name"]
    cols_new = ["id_product", "id_version", "createdOn", "supplyType",
                "reason", "format", "productId", "product", "name"]
    df = (dl_packages(key, fetch=fetch)[cols_old]
          .rename(columns=dict(zip(cols_old, cols_new)))
          .sort_values(["id_product", "id_version"], ascending=False))
    if latest:
        df = df.groupby("id_product").first().reset_index()
    if full:
        df = df.query('supplyType == "Full"')
    return df


# ---------------------------------------------------------------------------
# Maps API (XYZ raster tiles)
# ---------------------------------------------------------------------------

AVAILABLE_LAYERS = [
    "Road_3857", "Road_27700",
    "Outdoor_3857", "Outdoor_27700",
    "Light_3857", "Light_27700",
    "Leisure_27700",
]


class OSTileProvider(dict):
    """XYZ raster tile source descriptor (``cdap_geo/os.py:17-49``).

    The reference subclasses ``xyzservices.TileProvider`` (absent
    here); a TileProvider IS a dict of (name, url-template, max_zoom,
    attribution) — contextily/folium accept any mapping with these
    keys, so a plain dict subclass keeps the same downstream contract.
    ``tile_url(z, x, y)`` resolves a concrete tile; fetching the PNG
    is the caller's concern (no network in this sandbox). The vector
    side of raster<->vector assignment lives in ``operators/tiles.py``
    (computed (z, x, y) ids per geometry).
    """

    def __init__(self, key: str, layer: str = "Light_3857", **kwargs):
        if layer not in AVAILABLE_LAYERS:
            raise AssertionError(
                f"{layer} not in AvailableLayers: "
                f"{', '.join(AVAILABLE_LAYERS)}")
        if layer.endswith("_27700"):
            import warnings
            warnings.warn(f"{layer}, CRS=EPSG:27700 is not recognised "
                          "by contextily or folium.")
        super().__init__({
            "name": f"OS Maps {layer}",
            "url": ("https://api.os.uk/maps/raster/v1/zxy/"
                    f"{layer}/{{z}}/{{x}}/{{y}}.png?key={key}"),
            "max_zoom": 16,
            "attribution": "Contains OS data (c) Crown copyright and "
                           "database right",
            **kwargs,
        })

    def tile_url(self, z: int, x: int, y: int) -> str:
        return self["url"].format(z=z, x=x, y=y)
