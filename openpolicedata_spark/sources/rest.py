"""DataLoader bridge over the portal Python Data Sources.

`Source.load(...)` (reference data.py:1165-1219) routes here for REST
DataTypes. The loader builds the pushdown options (date WHERE, static
query predicates, agency equality — reference data.py:1372-1436), reads
through ``spark.read.format("opd_<portal>")``, and re-applies the exact
date filter locally when the pushed clause was inaccurate (reference
`_filter_inaccurate_date_query`, data_loader.py:41-66).
"""

from __future__ import annotations

import datetime as _dt

import json
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openpolicedata_spark import defs
from openpolicedata_spark.sources.base import (
    DataLoader,
    DateInput,
    apply_limit_offset,
    clean_date_input,
)
from openpolicedata_spark.sources.portals.where import (
    DateFormat,
    Where,
    and_wheres,
    build_agency_where,
    build_date_where,
    build_equals_where,
)
from openpolicedata_spark.sources.portals.transport import encode_transport

_registered_sessions: set[int] = set()


def _ensure_registered(spark: SparkSession) -> None:
    sid = id(spark)
    if sid in _registered_sessions:
        return
    from openpolicedata_spark.sources.portals.arcgis import ArcgisDataSource
    from openpolicedata_spark.sources.portals.carto import CartoDataSource
    from openpolicedata_spark.sources.portals.ckan import CkanDataSource
    from openpolicedata_spark.sources.portals.ods import OdsDataSource
    from openpolicedata_spark.sources.portals.socrata import SocrataDataSource

    for cls in (SocrataDataSource, ArcgisDataSource, CkanDataSource,
                CartoDataSource, OdsDataSource):
        spark.dataSource.register(cls)
    _registered_sessions.add(sid)


class RestLoader(DataLoader):
    """Generic portal loader: one subclass-free class parameterized by the
    data-source format name + client factory (the per-portal WHERE dialects
    live in portals/where.py)."""

    format_name: str

    def __init__(self, spark: SparkSession, *, format_name: str, url: str,
                 dataset: str = "", date_field: Optional[str] = None,
                 agency_field: Optional[str] = None,
                 date_format: str = DateFormat.TIMESTAMP.value,
                 query: Optional[dict] = None,
                 page_size: Optional[int] = None,
                 transport=None):
        super().__init__(spark)
        _ensure_registered(spark)
        self.format_name = format_name
        self.url = url
        self.dataset = dataset or ""
        self.date_field = date_field
        self.agency_field = agency_field
        # 'auto' defers to a one-page driver-side probe (portals/probe.py,
        # the reference's __date_format_search re-expressed)
        self._date_format: Optional[DateFormat] = (
            None if date_format == "auto" else DateFormat(date_format))
        self.query = query or {}
        self.page_size = page_size
        self.transport_pickle: Optional[str] = (
            encode_transport(transport) if transport is not None else None)

    def isfile(self) -> bool:
        return False

    @property
    def date_format(self) -> DateFormat:
        if self._date_format is None:
            from openpolicedata_spark.sources.portals.probe import probe_date_format

            fmt = None
            if self.date_field:
                fmt = probe_date_format(self._client(), self.date_field)
            self._date_format = fmt or DateFormat.TIMESTAMP
        return self._date_format

    # -- client (driver-side fast paths) ------------------------------------
    def _client(self):
        from openpolicedata_spark.sources.portals.transport import resolve_transport

        opts = self._base_options()
        from openpolicedata_spark.sources.portals import FORMAT_TO_SOURCE

        cls = FORMAT_TO_SOURCE[self.format_name]
        return cls.make_client(opts, resolve_transport(opts))

    def _base_options(self) -> dict:
        opts = {"url": self.url, "dataset": self.dataset}
        if self.transport_pickle:
            opts["transport_pickle"] = self.transport_pickle
        return opts

    # -- WHERE construction --------------------------------------------------
    def _static_where(self, dialect) -> Optional[str]:
        parts = [build_equals_where(k, v, dialect).clause
                 for k, v in self.query.items()]
        return and_wheres(*parts) if parts else None

    def _wheres(self, date, agency, dialect) -> tuple[list[Where], bool]:
        """(clauses, accurate). Mirrors per-loader `__construct_where`."""
        rng = clean_date_input(date)
        parts_static = [self._static_where(dialect)]
        if agency and self.agency_field:
            parts_static.append(build_agency_where(self.agency_field, agency, dialect).clause)
        static = and_wheres(*[p for p in parts_static if p])
        if rng is None or self.date_field is None:
            return ([Where(static)] if static else [Where(None)]), True  # type: ignore[arg-type]
        dws = build_date_where(self.date_field, rng[0], rng[1],
                               self.date_format, dialect)
        accurate = all(w.accurate for w in dws)
        return ([Where(and_wheres(w.clause, static), w.accurate) for w in dws],
                accurate)

    # -- load ----------------------------------------------------------------
    def load(self, date: DateInput = None, nrows: Optional[int] = None,
             offset: int = 0, *, agency: Optional[str] = None,
             select: Optional[list[str]] = None,
             sortby: Optional[str] = None) -> DataFrame:
        opts = self._base_options()
        client = self._client()
        wheres, accurate = self._wheres(date, agency, client.dialect)
        clauses = [w for w in wheres if w.clause]
        if len(clauses) == 1:
            opts["where"] = clauses[0].clause
            opts["where_accurate"] = "true" if clauses[0].accurate else "false"
        elif clauses:
            # multi-clause (text-date LIKE families): keep them separate so
            # each gets its own count + partitions; encode as JSON
            opts["wheres_json"] = json.dumps(
                [[w.clause, w.accurate] for w in clauses])
        pushed_select = select
        if (select and not accurate and self.date_field
                and self.date_field not in select):
            # the residual exact date filter needs the date column even
            # when the caller didn't select it — fetch it, drop it below
            pushed_select = list(select) + [self.date_field]
        if pushed_select:
            opts["select"] = ", ".join(pushed_select)
        if self.page_size:
            opts["page_size"] = str(self.page_size)
        # push nrows/offset into the reader ONLY when exact (accurate
        # clauses): otherwise the residual filter changes row positions
        # (reference data_loader.py:41-66 applies offset after re-filter).
        if accurate:
            if nrows is not None:
                opts["nrows"] = str(nrows)
            if offset:
                opts["offset"] = str(offset)
        df = self.spark.read.format(self.format_name).options(**opts).load()
        if not accurate:
            df = self._residual_date_filter(df, date)
            df = apply_limit_offset(df, nrows, offset)
        if select:
            # the portal projected server-side, but the sampled schema
            # covers every column — without this the result would keep the
            # non-selected columns as silent all-null fields (and the
            # residual path above may have fetched an extra date column)
            df = df.select(*select)
        if sortby == "date" and self.date_field:
            df = df.orderBy(self.date_field)
        return df

    def load_stream(self, date: DateInput = None, *,
                    agency: Optional[str] = None,
                    select: Optional[list[str]] = None) -> DataFrame:
        """STREAMING portal ingest (round 13 — the incremental face of
        `load`, via the Python streaming data source API): returns a
        streaming DataFrame whose micro-batches page through the
        portal in its stable order, the committed row offset living in
        the query checkpoint — so a scheduled `trigger(availableNow)`
        drain (or a long-running processing-time trigger) ingests each
        portal row exactly once across restarts, fetching ONLY rows
        beyond the last committed offset. Filters must be ACCURATE
        (single-clause) — the text-date LIKE families and residual
        re-filters would break the linear offset, so they raise here;
        an availableNow drain advances one page per trigger (loop to
        catch a backlog up — semantics in PortalStreamReader)."""
        opts = self._base_options()
        client = self._client()
        wheres, accurate = self._wheres(date, agency, client.dialect)
        if not accurate:
            raise ValueError(
                "load_stream needs an ACCURATE pushed filter (the "
                "residual re-filter would change row positions and "
                "break the stream's linear offset); use a timestamp "
                "date_format or filter downstream")
        clauses = [w for w in wheres if w.clause]
        if len(clauses) == 1:
            opts["where"] = clauses[0].clause
        elif clauses:
            raise ValueError(
                "load_stream supports at most one WHERE clause "
                f"(got {len(clauses)})")
        if select:
            opts["select"] = ", ".join(select)
        if self.page_size:
            opts["page_size"] = str(self.page_size)
        df = (self.spark.readStream.format(self.format_name)
              .options(**opts).load())
        if select:
            df = df.select(*select)
        return df

    def _residual_date_filter(self, df: DataFrame, date: DateInput) -> DataFrame:
        """Exact re-filter after inaccurate pushdown. Day-precision formats
        use a plain between; coarser formats (quarter/year) use *period
        overlap* — the reference's pd.Period semantics (data.py:1868-1960):
        a '2020 Q1' value matches any range intersecting Jan-Mar 2020."""
        rng = clean_date_input(date)
        if rng is None or self.date_field is None:
            return df
        parsed = _parse_text_date(F.col(self.date_field), self.date_format)
        start = F.lit(rng[0].strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
        stop = F.lit(rng[1].replace(hour=23, minute=59, second=59)
                     .strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
        if self.date_format == DateFormat.YYYYQ_TEXT:
            period_end = F.timestamp_add("SECOND", F.lit(-1),
                                         F.timestamp_add("MONTH", F.lit(3), parsed))
            return df.where((parsed <= stop) & (period_end >= start))
        if self.date_format == DateFormat.YEAR_NUMERIC:
            y = F.col(self.date_field).cast("int")
            return df.where(y.between(rng[0].year, rng[1].year))
        return df.where(parsed.between(start, stop))

    # -- fast paths -----------------------------------------------------------
    def get_count(self, date: DateInput = None, *, agency: Optional[str] = None,
                  force: bool = False) -> int:
        """Server-side count(*) pushdown, no Spark job (reference
        socrata.py:162-232 et al., memo data_loader.py:449-457)."""
        key = (repr(date), agency)
        if not force and self._last_count and self._last_count[0] == key:
            return self._last_count[1]
        client = self._client()
        wheres, accurate = self._wheres(date, agency, client.dialect)
        if accurate:
            n = sum(client.count(w.clause) for w in wheres)
        else:
            n = self.load(date=date, agency=agency).count()
        self._last_count = (key, n)
        return n

    def get_years(self, date_field: Optional[str] = None, *,
                  force: bool = False) -> list[int]:
        """Remote year discovery: per-year count probes walking backward
        from the current year with the reference's miss tolerances
        (data_loader.py:324-378: 20-year recent window, 10-year gap)."""
        field = date_field or self.date_field
        if field is None:
            raise ValueError("date_field required")
        client = self._client()
        # the probe must carry the same static catalog predicates count()
        # and load() apply: a dataset shared by several table types via
        # query={'type': ...} would otherwise report years where ANY type
        # has rows, and load(year) for this type then returns empty
        static = self._static_where(client.dialect)
        years: list[int] = []
        misses, year = 0, _dt.date.today().year
        while misses < (20 if not years else 10) and year >= 1900:
            wheres = build_date_where(field, _dt.datetime(year, 1, 1),
                                      _dt.datetime(year, 12, 31),
                                      self.date_format, client.dialect)
            n = sum(client.count(and_wheres(w.clause, static))
                    for w in wheres)
            if n > 0:
                years.append(year)
                misses = 0
            else:
                misses += 1
            year -= 1
        return sorted(years)

    def get_agencies(self, agency_field: str, partial: Optional[str] = None) -> list[str]:
        client = self._client()
        if hasattr(client, "distinct"):
            return client.distinct(agency_field, partial)
        return super().get_agencies(agency_field, partial)


def _parse_text_date(col, fmt: DateFormat):
    """Exact re-parse of a text date column for residual filtering."""
    if fmt == DateFormat.MMDDYYYY_TEXT:
        return F.to_timestamp(col, "M/d/yyyy")
    if fmt == DateFormat.YYYYMMDD_TEXT:
        return F.to_timestamp(col, "yyyyMMdd")
    if fmt == DateFormat.MONTH_ABBREV_TEXT:
        return F.coalesce(F.try_to_timestamp(col, F.lit("MMM d, yyyy")),
                          F.try_to_timestamp(col, F.lit("MMM d yyyy")))
    if fmt == DateFormat.YYYYQ_TEXT:
        y = F.regexp_extract(col, r"^(\d{4})", 1).cast("int")
        q = F.regexp_extract(col, r"Q(\d)", 1).cast("int")
        return F.make_timestamp_ntz(y, (q - 1) * 3 + 1, F.lit(1),
                                    F.lit(0), F.lit(0), F.lit(0))
    if fmt == DateFormat.YEAR_NUMERIC:
        return F.make_timestamp_ntz(col.cast("int"), F.lit(7), F.lit(2),
                                    F.lit(0), F.lit(0), F.lit(0))
    return col.cast("timestamp_ntz")


_FORMAT_BY_DATATYPE = {
    defs.DataType.ARCGIS.value: "opd_arcgis",
    defs.DataType.CKAN.value: "opd_ckan",
    defs.DataType.CARTO.value: "opd_carto",
    defs.DataType.OPENDATASOFT.value: "opd_ods",
    defs.DataType.SOCRATA.value: "opd_socrata",
}


def make_rest_loader(spark: SparkSession, data_type: str, row: pd.Series,
                     transport=None) -> RestLoader:
    """Factory from a catalog row (reference data.py:1819-1857)."""
    ds = row.get("dataset_id")
    ds = "" if ds is None or (isinstance(ds, float) and pd.isna(ds)) else str(ds)
    q = row.get("query")
    if isinstance(q, str) and q.strip():
        q = json.loads(q)
    return RestLoader(
        spark,
        format_name=_FORMAT_BY_DATATYPE[data_type],
        url=row["URL"],
        dataset=ds,
        date_field=row.get("date_field"),
        agency_field=row.get("agency_field"),
        date_format=(row.get("date_format")
                     if isinstance(row.get("date_format"), str)
                     and row.get("date_format") else "auto"),
        query=q if isinstance(q, dict) else None,
        transport=transport,
    )
