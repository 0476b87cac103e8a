"""HTML table loader.

Parity: /root/reference/openpolicedata/data_loaders/html.py:10-194 —
`pd.read_html` with a browser UA, exactly one table expected, then the
standard local date/agency filter. Driver-side parse (HTML tables are
small) → ``spark.createDataFrame``; the lxml/bs4 parse is import-gated
(not in this container) and tests inject pre-parsed tables.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openpolicedata_spark.sources.base import (
    DataLoader,
    DateInput,
    apply_limit_offset,
    filter_dataframe,
)


class HtmlLoader(DataLoader):
    def __init__(self, spark: SparkSession, url: str,
                 date_field: Optional[str] = None,
                 agency_field: Optional[str] = None,
                 query: Optional[dict] = None,
                 tables: Optional[list[pd.DataFrame]] = None):
        super().__init__(spark)
        self.url = url
        self.date_field = date_field
        self.agency_field = agency_field
        self.query = query or {}
        self._tables = tables

    def isfile(self) -> bool:
        return True

    def _fetch(self) -> str:
        """Page bytes → text. Local paths read directly; http(s) URLs go
        through urllib with a browser UA (reference html.py sends one —
        agency sites 403 the default Python UA)."""
        url = str(self.url)
        if url.startswith(("http://", "https://")):
            import urllib.request

            req = urllib.request.Request(
                url, headers={"User-Agent": "Mozilla/5.0"})
            with urllib.request.urlopen(req, timeout=60) as resp:
                charset = resp.headers.get_content_charset() or "utf-8"
                return resp.read().decode(charset, errors="replace")
        with open(url, encoding="utf-8", errors="replace") as f:
            return f.read()

    def _parse(self) -> pd.DataFrame:
        tables = self._tables
        if tables is None:
            # fetch ONCE with the browser UA (agency sites 403 the
            # default Python UA — pd.read_html(url) would hit exactly
            # that), then hand the text to whichever parser exists
            text = self._fetch()
            try:
                import io

                import lxml  # noqa: F401

                tables = pd.read_html(io.StringIO(text))
            except ImportError:
                # stdlib fallback: html.parser-based table extraction
                # (sources/htmltable.py) — same list-of-frames contract.
                from openpolicedata_spark.sources.htmltable import (
                    read_html_tables,
                )
                tables = read_html_tables(text)
        if len(tables) != 1:
            # reference html.py expects exactly one table per page
            raise ValueError(f"expected exactly 1 HTML table, got {len(tables)}")
        return tables[0]

    def load(self, date: DateInput = None, nrows: Optional[int] = None,
             offset: int = 0, *, agency: Optional[str] = None,
             select: Optional[list[str]] = None,
             sortby: Optional[str] = None) -> DataFrame:
        pdf = self._parse()
        df = self.spark.createDataFrame(pdf.astype(str).where(pdf.notna(), None))
        for k, v in self.query.items():
            df = df.filter(F.col(k) == F.lit(v))
        df = filter_dataframe(df, date_field=self.date_field, date_filter=date,
                              agency=agency, agency_field=self.agency_field)
        if select:
            df = df.select(*select)
        if sortby == "date" and self.date_field:
            df = df.orderBy(self.date_field)
        return apply_limit_offset(df, nrows, offset)
