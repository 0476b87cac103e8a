"""REST portal Python Data Sources (Socrata / ArcGIS / CKAN / Carto /
Opendatasoft) — reference data_loaders re-expressed as Spark sources with
filter pushdown and partition-parallel paging (SURVEY.md §2.1, §4)."""

from openpolicedata_spark.sources.portals.arcgis import ArcgisDataSource
from openpolicedata_spark.sources.portals.carto import CartoDataSource
from openpolicedata_spark.sources.portals.ckan import CkanDataSource
from openpolicedata_spark.sources.portals.ods import OdsDataSource
from openpolicedata_spark.sources.portals.socrata import SocrataDataSource
from openpolicedata_spark.sources.portals.transport import (
    FakeTransport,
    HttpTransport,
    encode_transport,
)
from openpolicedata_spark.sources.portals.where import (
    DateFormat,
    Dialect,
    Where,
    build_agency_where,
    build_date_where,
    build_equals_where,
)

FORMAT_TO_SOURCE = {
    "opd_socrata": SocrataDataSource,
    "opd_arcgis": ArcgisDataSource,
    "opd_ckan": CkanDataSource,
    "opd_carto": CartoDataSource,
    "opd_ods": OdsDataSource,
}

__all__ = [
    "ArcgisDataSource", "CartoDataSource", "CkanDataSource",
    "OdsDataSource", "SocrataDataSource", "FakeTransport", "HttpTransport",
    "encode_transport", "DateFormat", "Dialect", "Where",
    "build_agency_where", "build_date_where", "build_equals_where",
    "FORMAT_TO_SOURCE",
]
