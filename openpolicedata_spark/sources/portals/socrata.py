"""Socrata (SODA/SoQL) data source.

Parity: /root/reference/openpolicedata/data_loaders/socrata.py —
`$where`/`$select` construction (:79-144, 422-521), `$order=':id'` stable
paging (:298-311), `select count(*)` pushdown (:189-232), distinct-value
fast path `output_type='set'` (:464-472). Re-expressed as a PySpark
Python Data Source: one partition per `$offset` window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect


@dataclass
class SocrataClient(PortalClient):
    url: str = ""          # host, e.g. https://data.cityofnewyork.us
    dataset: str = ""      # 4x4 id
    order_key: str = ":id"

    def __post_init__(self):
        self.dialect = Dialect.SOQL
        self.epoch_ms_fields = set()
        self.drop_fields = set()
        self.max_page = 100_000   # reference data_loader.py:33

    def _endpoint(self) -> str:
        return f"{self.url.rstrip('/')}/resource/{self.dataset}.json"

    def count(self, where: Optional[str]) -> int:
        rows = self.transport.get_json(
            self._endpoint(),
            {"$select": "count(*) as count", "$where": where},
        )
        return int(rows[0]["count"]) if rows else 0

    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]:
        return self.transport.get_json(
            self._endpoint(),
            {
                "$limit": limit,
                "$offset": offset,
                "$order": self.order_key,
                "$where": where,
                "$select": select,
            },
        )

    def distinct(self, field: str, partial: Optional[str] = None) -> list[str]:
        """reference socrata.py:464-472 + data.py:1036-1049."""
        where = f"lower({field}) like '%{partial.lower()}%'" if partial else None
        rows = self.transport.get_json(
            self._endpoint(),
            {"$select": f"DISTINCT {field}", "$where": where, "$limit": 100_000},
        )
        return sorted({r[field] for r in rows if r.get(field) is not None})


class SocrataDataSource(PortalDataSource):
    @classmethod
    def name(cls) -> str:
        return "opd_socrata"

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> SocrataClient:
        return SocrataClient(transport=transport, url=options["url"],
                             dataset=options["dataset"])
