"""CKAN datastore_search_sql data source.

Parity: /root/reference/openpolicedata/data_loaders/ckan.py — full-SQL
passthrough `SELECT ... WHERE ... ORDER BY "_id" OFFSET n LIMIT m`
(:125-192), 32 000-row page cap (:316), `COUNT(*)` pushdown (:84-122),
service columns `_id`/`_full_text` dropped (:330-336).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from openpolicedata_spark.sources.portals.core import PortalClient, PortalDataSource
from openpolicedata_spark.sources.portals.where import Dialect


@dataclass
class CkanClient(PortalClient):
    url: str = ""       # portal root, e.g. https://data.virginia.gov
    dataset: str = ""   # datastore resource id

    def __post_init__(self):
        self.dialect = Dialect.SQL
        self.epoch_ms_fields = set()
        self.drop_fields = {"_id", "_full_text"}
        self.max_page = 32_000  # reference ckan.py:316

    def _sql(self, sql: str) -> list[dict]:
        out = self.transport.get_json(
            f"{self.url.rstrip('/')}/api/3/action/datastore_search_sql",
            {"sql": sql},
        )
        if not out.get("success", True):
            raise RuntimeError(f"CKAN error: {out.get('error')}")
        return out["result"]["records"]

    def count(self, where: Optional[str]) -> int:
        w = f" WHERE {where}" if where else ""
        rows = self._sql(f'SELECT COUNT(*) AS count FROM "{self.dataset}"{w}')
        return int(rows[0]["count"])

    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]:
        w = f" WHERE {where}" if where else ""
        cols = select or "*"
        rows = self._sql(
            f'SELECT {cols} FROM "{self.dataset}"{w} '
            f'ORDER BY "_id" OFFSET {offset} LIMIT {limit}'
        )
        return [{k: v for k, v in r.items() if k not in self.drop_fields}
                for r in rows]

    def distinct(self, field: str, partial: Optional[str] = None) -> list[str]:
        # case-insensitive like the Socrata client and the base loader
        # (PostgreSQL LIKE is case-sensitive); quotes in the partial are
        # doubled so they can't break out of the literal
        if partial:
            p = partial.replace("'", "''").lower()
            w = f" WHERE lower(\"{field}\") LIKE '%{p}%'"
        else:
            w = ""
        rows = self._sql(f'SELECT DISTINCT "{field}" FROM "{self.dataset}"{w}')
        return sorted(r[field] for r in rows if r.get(field) is not None)


class CkanDataSource(PortalDataSource):
    _drop = frozenset({"_id", "_full_text"})

    @classmethod
    def name(cls) -> str:
        return "opd_ckan"

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> CkanClient:
        return CkanClient(transport=transport, url=options["url"],
                          dataset=options["dataset"])
