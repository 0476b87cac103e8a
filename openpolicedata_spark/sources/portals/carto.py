"""Carto SQL API data source.

Parity: /root/reference/openpolicedata/data_loaders/carto.py — SQL over
`api/v2/sql` with `ORDER BY cartodb_id OFFSET/LIMIT` stable paging
(:137-173), `count(*)` pushdown (:90-134).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect


@dataclass
class CartoClient(PortalClient):
    url: str = ""       # e.g. https://phl.carto.com  (reference carto.py:44-56)
    dataset: str = ""   # table name

    def __post_init__(self):
        self.dialect = Dialect.SQL
        self.epoch_ms_fields = set()
        self.drop_fields = {"the_geom", "the_geom_webmercator", "cartodb_id"}
        self.max_page = 100_000  # reference data_loader.py:33

    def _sql(self, q: str) -> list[dict]:
        out = self.transport.get_json(f"{self.url.rstrip('/')}/api/v2/sql", {"q": q})
        return out["rows"]

    def count(self, where: Optional[str]) -> int:
        w = f" WHERE {where}" if where else ""
        return int(self._sql(f"SELECT count(*) FROM {self.dataset}{w}")[0]["count"])

    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]:
        w = f" WHERE {where}" if where else ""
        cols = select or "*"
        rows = self._sql(
            f"SELECT {cols} FROM {self.dataset}{w} "
            f"ORDER BY cartodb_id OFFSET {offset} LIMIT {limit}"
        )
        return [{k: v for k, v in r.items() if k not in self.drop_fields}
                for r in rows]


class CartoDataSource(PortalDataSource):
    _drop = frozenset({"the_geom", "the_geom_webmercator", "cartodb_id"})

    @classmethod
    def name(cls) -> str:
        return "opd_carto"

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> CartoClient:
        return CartoClient(transport=transport, url=options["url"],
                           dataset=options["dataset"])
