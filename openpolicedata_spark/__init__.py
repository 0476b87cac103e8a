"""openpolicedata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `openpolicedata` library
(pandas-based federated access layer for police open data), re-expressed
Spark-first for 100 TB scale.

Architecture (see SURVEY.md for the full blueprint):

- ``catalog``   — dataset catalog (reference: datasets.py) as driver-side
                  metadata with a fixed schema; broadcastable to Spark.
- ``data``      — ``Source`` / ``Table`` user API (reference: data.py).
- ``sources``   — pluggable loaders (reference: data_loaders/*): native
                  Spark readers for files, PySpark Python DataSources with
                  predicate/limit pushdown for REST portals.
- ``functions`` — the standardization "operator library" (reference:
                  _converters.py, datetime_parser.py) compiled to native
                  Column expressions (whole-stage-codegen friendly), plus
                  text-analysis functions for LLM-data pipelines.
- ``operators`` — relational conveniences (merge/expand) and at-scale
                  operators (dedup, similarity search) beyond the reference.
- ``standardize`` — schema-inference pipeline (reference: preproc.py):
                  driver-side column identification over schema + samples,
                  distributed application of the chosen mappings.
- ``streaming`` — Structured Streaming ingestion (beyond reference).
- ``plans``     — physical-plan audit: assertions for pushdown, pruning,
                  broadcast joins, shuffle budgets, JVM-only hot paths.
"""

from openpolicedata_spark.session import get_spark
from openpolicedata_spark.catalog import Catalog, local_testdata_catalog
from openpolicedata_spark.data import (
    Source,
    Table,
    get_csv_filename,
    get_feather_filename,
    get_parquet_filename,
)
from openpolicedata_spark import defs
from openpolicedata_spark import exceptions
from openpolicedata_spark.defs import TableType, DataType

# reference parity: `opd.datasets.query(...)` module surface
# (reference datasets.py); our catalog module carries the same functions.
from openpolicedata_spark import catalog as datasets

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Catalog",
    "local_testdata_catalog",
    "Source",
    "Table",
    "datasets",
    "defs",
    "exceptions",
    "TableType",
    "DataType",
    "get_csv_filename",
    "get_feather_filename",
    "get_parquet_filename",
    "__version__",
]
