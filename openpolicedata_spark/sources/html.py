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

    def _parse(self) -> pd.DataFrame:
        tables = self._tables
        if tables is None:
            try:
                import lxml  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "HTML parsing requires lxml/bs4; install one or pass "
                    "pre-parsed tables via HtmlLoader(tables=...)") from e
            tables = pd.read_html(self.url)
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
