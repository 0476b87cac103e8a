"""ArcGIS Feature/Map Server data source.

Parity: /root/reference/openpolicedata/data_loaders/arcgis_class.py —
`resultOffset`/`resultRecordCount` paging capped at min(maxRecordCount,
32000) (:67,104-107), `returnCountOnly` (:127-172), `orderByFields`
stable paging (:199-200), esri epoch-ms date fields → timestamps
(:516-524). Geometry handling (Point x/y) is flattened into
`geo_x`/`geo_y` double columns per SURVEY §1.3 (struct/lon-lat, no
geopandas at scale).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect

_HARD_CAP = 32_000  # reference arcgis_class.py:67


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

    def _probe_metadata(self) -> None:
        """Layer metadata: maxRecordCount cap + esriFieldTypeDate fields
        (reference arcgis_class.py:95-126)."""
        if self._probed:
            return
        meta = self.transport.get_json(self.url.rstrip("/"), {"f": "json"})
        self.max_page = min(int(meta.get("maxRecordCount", _HARD_CAP)), _HARD_CAP)
        self.epoch_ms_fields = {
            f["name"] for f in meta.get("fields", [])
            if f.get("type") == "esriFieldTypeDate"
        }
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
        rows = []
        for feat in out.get("features", []):
            r = dict(feat.get("attributes", {}))
            geom = feat.get("geometry")
            if geom and "x" in geom:
                r["geo_x"], r["geo_y"] = geom.get("x"), geom.get("y")
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
