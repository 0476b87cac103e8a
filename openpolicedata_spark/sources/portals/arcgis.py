"""ArcGIS Feature/Map Server data source.

Parity: /root/reference/openpolicedata/data_loaders/arcgis_class.py —
`resultOffset`/`resultRecordCount` paging capped at min(maxRecordCount,
32000) (:67,104-107), `returnCountOnly` (:127-172), `orderByFields`
stable paging (:199-200), esri epoch-ms date fields → timestamps
(:516-524). Geometry handling (Point x/y) is flattened into
`geo_x`/`geo_y` double columns per SURVEY §1.3 (struct/lon-lat, no
geopandas at scale).

CRS: the reference carries the layer's spatialReference wkid into a
GeoDataFrame CRS (arcgis_class.py:485,516-546). Here the wkid is probed
from the layer metadata / query response; Web-Mercator layers (wkid
102100/3857/900913 — meters, the most common non-WGS84 ArcGIS CRS) are
converted to lon/lat degrees at fetch time so `geo_x`/`geo_y` always
mean lon/lat for the common CRSs; other projections pass through raw
with the authority:code recorded in `geo_crs` (surfaced as column
metadata by PortalDataSource.schema)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect

_HARD_CAP = 32_000  # reference arcgis_class.py:67

# Web-Mercator spherical radius (EPSG:3857 / ESRI:102100 definition)
_MERC_R = 6378137.0
_WEB_MERCATOR_WKIDS = {102100, 3857, 900913}


def _merc_to_lonlat(x: float, y: float) -> tuple[float, float]:
    """Inverse spherical Mercator: meters → WGS-84 degrees."""
    lon = math.degrees(x / _MERC_R)
    lat = math.degrees(2.0 * math.atan(math.exp(y / _MERC_R)) - math.pi / 2.0)
    return lon, lat


@dataclass
class ArcgisClient(PortalClient):
    url: str = ""   # layer endpoint .../FeatureServer/0
    order_field: str = "OBJECTID"

    def __post_init__(self):
        self.dialect = Dialect.ARCGIS
        self.epoch_ms_fields: set = set()
        self.drop_fields = set()
        self.max_page = _HARD_CAP
        self._probed = False
        self.wkid: Optional[int] = None
        self.geo_crs: Optional[str] = None

    def _set_wkid(self, wkid) -> None:
        try:
            w = int(wkid)
        except (TypeError, ValueError):
            return
        self.wkid = w
        if w in _WEB_MERCATOR_WKIDS or w == 4326:
            self.geo_crs = "EPSG:4326"  # mercator is converted at fetch
        else:
            # the ESRI authority owns the 6-digit wkids (reference falls
            # back to CRS.from_authority("ESRI", wkid), arcgis_class.py:545)
            self.geo_crs = f"ESRI:{w}" if w >= 100_000 else f"EPSG:{w}"

    def _probe_metadata(self) -> None:
        """Layer metadata: maxRecordCount cap + esriFieldTypeDate fields
        (reference arcgis_class.py:95-126) + spatialReference wkid
        (:485)."""
        if self._probed:
            return
        meta = self.transport.get_json(self.url.rstrip("/"), {"f": "json"})
        self.max_page = min(int(meta.get("maxRecordCount", _HARD_CAP)), _HARD_CAP)
        self.epoch_ms_fields = {
            f["name"] for f in meta.get("fields", [])
            if f.get("type") == "esriFieldTypeDate"
        }
        sr = meta.get("spatialReference") \
            or meta.get("extent", {}).get("spatialReference") or {}
        self._set_wkid(sr.get("latestWkid") or sr.get("wkid"))
        self._probed = True

    def count(self, where: Optional[str]) -> int:
        self._probe_metadata()
        out = self.transport.get_json(
            f"{self.url.rstrip('/')}/query",
            {"where": where or "1=1", "returnCountOnly": "true", "f": "json"},
        )
        return int(out["count"])

    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]:
        self._probe_metadata()
        out = self.transport.get_json(
            f"{self.url.rstrip('/')}/query",
            {
                "where": where or "1=1",
                "outFields": select or "*",
                "resultOffset": offset,
                "resultRecordCount": limit,
                "orderByFields": self.order_field,
                "f": "json",
            },
        )
        sr = out.get("spatialReference") or {}
        if sr:  # the query response is authoritative (reference :485)
            self._set_wkid(sr.get("latestWkid") or sr.get("wkid"))
        to_lonlat = self.wkid in _WEB_MERCATOR_WKIDS
        rows = []
        for feat in out.get("features", []):
            r = dict(feat.get("attributes", {}))
            geom = feat.get("geometry")
            if geom and "x" in geom:
                try:  # reference handles x == "NaN" rows (:535)
                    x, y = float(geom["x"]), float(geom["y"])
                except (TypeError, ValueError):
                    x = y = None
                if x is not None and to_lonlat:
                    x, y = _merc_to_lonlat(x, y)
                r["geo_x"], r["geo_y"] = x, y
            rows.append(r)
        return rows


class ArcgisDataSource(PortalDataSource):
    @classmethod
    def name(cls) -> str:
        return "opd_arcgis"

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> ArcgisClient:
        c = ArcgisClient(transport=transport, url=options["url"])
        if options.get("order_field"):
            c.order_field = options["order_field"]
        return c
