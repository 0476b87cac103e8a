"""Opendatasoft Explore v2 data source.

Parity: /root/reference/openpolicedata/data_loaders/opendatasoft.py —
ODSQL `where` on `/records` (:84-112 count, :202-209 where), offset+limit
paging with the 10 000-row API window handled by capping the page size
(:115-199 uses a bulk CSV export instead; the records path keeps the
pushdown story uniform and partitions cleanly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect


@dataclass
class OdsClient(PortalClient):
    url: str = ""       # portal root
    dataset: str = ""

    def __post_init__(self):
        self.dialect = Dialect.ODSQL
        self.epoch_ms_fields = set()
        self.drop_fields = set()
        # offset+limit must stay within the API's 10 000-row window
        # (reference opendatasoft.py:147-156)
        self.max_page = 5_000

    def _endpoint(self) -> str:
        return (f"{self.url.rstrip('/')}/api/explore/v2.1/catalog/datasets/"
                f"{self.dataset}/records")

    def count(self, where: Optional[str]) -> int:
        out = self.transport.get_json(
            self._endpoint(), {"where": where, "limit": 0})
        return int(out["total_count"])

    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]:
        out = self.transport.get_json(
            self._endpoint(),
            {
                "where": where,
                "select": select,
                "offset": offset,
                "limit": limit,
                "order_by": "record_timestamp",
            },
        )
        return out["results"]


class OdsDataSource(PortalDataSource):
    @classmethod
    def name(cls) -> str:
        return "opd_ods"

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> OdsClient:
        return OdsClient(transport=transport, url=options["url"],
                         dataset=options["dataset"])
