"""Socrata loader (DataLoader bridge).

Parity: /root/reference/openpolicedata/data_loaders/socrata.py:31-329.
The heavy lifting (SoQL WHERE construction, count pushdown, page
partitioning) lives in sources/portals/{where,core,socrata}.py; this
class adapts it to the Source.load() signature.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from openpolicedata_spark.sources.portals.where import DateFormat
from openpolicedata_spark.sources.rest import RestLoader


class SocrataLoader(RestLoader):
    def __init__(self, spark: SparkSession, *, url: str, data_set: str,
                 date_field: Optional[str] = None,
                 agency_field: Optional[str] = None,
                 date_format: str = DateFormat.TIMESTAMP.value,
                 query: Optional[dict] = None, transport=None,
                 page_size: Optional[int] = None):
        super().__init__(
            spark,
            format_name="opd_socrata",
            url=url,
            dataset=str(data_set) if data_set is not None else "",
            date_field=date_field,
            agency_field=agency_field,
            date_format=date_format,
            query=query,
            page_size=page_size,
            transport=transport,
        )
