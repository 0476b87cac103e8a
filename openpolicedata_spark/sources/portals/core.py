"""Shared machinery for the portal Python Data Sources.

Spark-first re-expression of the reference's serial page-fetch loop
(/root/reference/openpolicedata/data_loaders/socrata.py:313-319 and
data_loader.py:381-446): planning (count probe → offset windows) happens
once on the driver, then **each page window becomes an input partition**
and executors fetch pages in parallel. The reference's `Where.accurate`
flag maps onto Spark's pushed-filter contract: an inaccurate clause means
the source returns a superset and the exact filter is re-applied above
the scan.
"""

from __future__ import annotations

import datetime as _dt
import math
from abc import ABC, abstractmethod
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterator, Optional, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# geometry: struct<lon,lat> per SURVEY §1.3 (no geopandas at scale);
# covers Socrata `geolocation` dicts and GeoJSON Point values
_POINT_TYPE = StructType([StructField("lon", DoubleType()),
                          StructField("lat", DoubleType())])


def _as_point(v) -> object:
    """Normalize a portal geometry value to (lon, lat) or None.
    Socrata: {'latitude': '..', 'longitude': '..'} or
    {'type': 'Point', 'coordinates': [lon, lat]} (socrata.py:476-504)."""
    if not isinstance(v, dict):
        return None
    try:
        if "longitude" in v and "latitude" in v:
            return (float(v["longitude"]), float(v["latitude"]))
        if v.get("type") == "Point" and isinstance(v.get("coordinates"), (list, tuple)):
            lon, lat = v["coordinates"][:2]
            return (float(lon), float(lat))
    except (TypeError, ValueError):
        return None
    return None

from openpolicedata_spark.sources.portals.transport import resolve_transport
from openpolicedata_spark.sources.portals.where import (
    DateFormat,
    Dialect,
    Where,
    and_wheres,
    build_date_where,
    build_equals_where,
)

_ISO_FORMATS = ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d")


def parse_portal_timestamp(v: Any) -> Optional[_dt.datetime]:
    if v is None or v == "":
        return None
    if isinstance(v, _dt.datetime):
        return v
    s = str(v).rstrip("Z")
    if "." in s:
        s = s.split(".", 1)[0]
    for fmt in _ISO_FORMATS:
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def _looks_timestamp(v: Any) -> bool:
    return isinstance(v, str) and parse_portal_timestamp(v) is not None and len(v) >= 10


def infer_schema_from_rows(rows: Sequence[dict], epoch_ms_fields: set[str],
                           drop: set[str] = frozenset()) -> StructType:
    """Schema-on-read over a driver-side sample (the reference lets pandas
    infer, e.g. socrata.py:474-521; we sniff long/double/bool/timestamp and
    default to string). Column order = first-seen order."""
    cols: dict[str, set] = {}
    for r in rows:
        for k, v in r.items():
            if k in drop:
                continue
            kinds = cols.setdefault(k, set())
            if v is None or v == "":
                continue
            if k in epoch_ms_fields:
                kinds.add("ts")
            elif isinstance(v, dict) and _as_point(v) is not None:
                kinds.add("point")
            elif isinstance(v, bool):
                kinds.add("bool")
            elif isinstance(v, int):
                kinds.add("long")
            elif isinstance(v, float):
                kinds.add("double")
            elif _looks_timestamp(v):
                kinds.add("ts")
            else:
                kinds.add("str")
    fields = []
    for name, kinds in cols.items():
        if kinds == {"point"}:
            t = _POINT_TYPE
        elif kinds == {"ts"}:
            t = TimestampNTZType()
        elif kinds == {"bool"}:
            t = BooleanType()
        elif kinds == {"long"}:
            t = LongType()
        elif kinds and kinds <= {"long", "double"}:
            t = DoubleType()
        else:
            t = StringType()
        fields.append(StructField(name, t, nullable=True))
    return StructType(fields)


def convert_row(r: dict, schema: StructType, epoch_ms_fields: set[str]) -> tuple:
    out = []
    for f in schema.fields:
        v = r.get(f.name)
        if v is None or v == "":
            out.append(None)
        elif isinstance(f.dataType, StructType):
            out.append(_as_point(v))
        elif isinstance(f.dataType, TimestampNTZType):
            if f.name in epoch_ms_fields and isinstance(v, (int, float)):
                out.append(_dt.datetime.utcfromtimestamp(v / 1000.0))
            else:
                out.append(parse_portal_timestamp(v))
        elif isinstance(f.dataType, LongType):
            try:
                out.append(int(v))
            except (TypeError, ValueError):
                out.append(None)
        elif isinstance(f.dataType, DoubleType):
            try:
                out.append(float(v))
            except (TypeError, ValueError):
                out.append(None)
        elif isinstance(f.dataType, BooleanType):
            out.append(v if isinstance(v, bool) else str(v).lower() in ("true", "t", "1"))
        else:
            out.append(str(v))
    return tuple(out)


@dataclass
class PortalClient(ABC):
    """Picklable portal protocol: knows how to count and fetch one page.
    Subclasses add url/dataset fields. `transport` rides along in the
    reader pickle so executors can fetch."""

    transport: Any
    dialect: Dialect = dc_field(init=False)
    epoch_ms_fields: set = dc_field(default_factory=set, init=False)
    drop_fields: set = dc_field(default_factory=set, init=False)
    max_page: int = dc_field(default=100_000, init=False)  # reference data_loader.py:33

    @abstractmethod
    def count(self, where: Optional[str]) -> int: ...

    @abstractmethod
    def fetch(self, offset: int, limit: int, where: Optional[str],
              select: Optional[str] = None) -> list[dict]: ...


@dataclass
class PageSpec(InputPartition):
    where: Optional[str]
    offset: int
    limit: int


class PortalReader(DataSourceReader):
    """One input partition per page window; count-probe planning on the
    driver (reference `_setup_records_request` data_loader.py:381-439 →
    partition planning; serial loop → parallel fetch)."""

    def __init__(self, client: PortalClient, schema: StructType,
                 wheres: list[Where], page_size: int,
                 nrows: Optional[int] = None, offset: int = 0,
                 select: Optional[str] = None):
        self._client = client
        self._schema = schema
        self._wheres = wheres or [Where(None)]  # type: ignore[arg-type]
        self._page = min(page_size, client.max_page)
        self._nrows = nrows
        self._offset = offset
        self._select = select
        self._pushed: list[str] = []

    # -- filter pushdown ----------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Translate Catalyst filters into portal WHERE fragments.
        Anything we can't express exactly is yielded back as residual."""
        for flt in filters:
            clause = self._translate(flt)
            if clause is None:
                yield flt
            else:
                self._pushed.append(clause)

    def _translate(self, flt: Filter) -> Optional[str]:
        try:
            attr = flt.attribute
        except AttributeError:
            return None
        if len(attr) != 1:
            return None
        col = attr[0]
        d = self._client.dialect
        if isinstance(flt, EqualTo):
            if isinstance(flt.value, bool):
                # boolean literal syntax differs per portal (and the
                # string fallback would render `= 'True'`, matching
                # nothing while CONSUMING the filter) — leave it to Spark
                return None
            return build_equals_where(col, flt.value, d).clause
        ident = f'"{col}"' if d == Dialect.SQL else col
        if isinstance(flt, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
            op = {GreaterThan: ">", GreaterThanOrEqual: ">=",
                  LessThan: "<", LessThanOrEqual: "<="}[type(flt)]
            v = flt.value
            if isinstance(v, _dt.datetime):
                return f"{ident} {op} " + _ts(v, d)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return f"{ident} {op} {v}"
            if isinstance(v, str):
                return f"{ident} {op} '{v.replace(chr(39), chr(39) * 2)}'"
        return None

    # -- planning -----------------------------------------------------------
    def partitions(self) -> list[PageSpec]:
        pushed = and_wheres(*self._pushed) if self._pushed else None
        specs: list[PageSpec] = []
        remaining = self._nrows
        skip = self._offset
        for w in self._wheres:
            full = and_wheres(w.clause, pushed)
            n = self._client.count(full)
            # reference offset/nrows bookkeeping across WHERE clauses
            # (_setup_records_request data_loader.py:381-439)
            if skip >= n:
                skip -= n
                continue
            avail = n - skip
            take = avail if remaining is None else min(avail, remaining)
            if remaining is not None:
                remaining -= take
            base = skip
            skip = 0
            for i in range(math.ceil(take / self._page)):
                off = base + i * self._page
                lim = min(self._page, base + take - off)
                specs.append(PageSpec(where=full, offset=off, limit=lim))
            if remaining == 0:
                break
        if not specs:
            specs.append(PageSpec(where=and_wheres(self._wheres[0].clause, pushed),
                                  offset=0, limit=0))
        return specs

    # -- execution ----------------------------------------------------------
    def read(self, partition: PageSpec) -> Iterator[tuple]:
        if partition.limit == 0:
            return
        rows = self._client.fetch(partition.offset, partition.limit,
                                  partition.where, self._select)
        schema = self._schema
        epoch = self._client.epoch_ms_fields
        for r in rows:
            yield convert_row(r, schema, epoch)


def _ts(v: _dt.datetime, d: Dialect) -> str:
    from openpolicedata_spark.sources.portals.where import _ts_lit

    return _ts_lit(v, d)


class PortalStreamReader(SimpleDataSourceStreamReader):
    """Incremental PORTAL ingest (round 13 — the streaming face of the
    batch pager, via Spark 4's Python streaming data source API): the
    stream offset is the row offset within the portal's STABLE paging
    order, each micro-batch fetches at most one `page_size` window
    beyond the committed offset (a count probe bounds it — one portal
    call per batch), and an exhausted portal yields empty batches until
    new rows land. Offsets persist in the engine checkpoint, so a
    cron'd `trigger(availableNow)` drain — or a long-running
    processing-time trigger — ingests each portal row EXACTLY ONCE
    across restarts (a replayed batch re-fetches the same
    [start, end) window via `readBetweenOffsets`, the engine's replay
    contract).

    Assumption, stated honestly: the portal returns rows in a stable
    order and grows append-at-end — the SAME assumption the batch
    pager's offset windows already make (reference data_loader.py
    paging); a portal that inserts before the committed offset would
    skip/duplicate, exactly as a re-run batch pull would. Engine
    behavior (measured): an availableNow drain advances ONE read()
    call — loop drains (or run a processing-time trigger) to catch a
    backlog up."""

    def __init__(self, client: PortalClient, schema: StructType,
                 where: Optional[str], page_size: int,
                 select: Optional[str] = None):
        self._client = client
        self._schema = schema
        self._where = where
        self._page = min(page_size, client.max_page)
        self._select = select

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, offset: int, limit: int) -> "list[tuple]":
        # a LIST, not a generator: the engine pickles the prefetched
        # batch between the plan-time worker and the executors
        rows = self._client.fetch(offset, limit, self._where,
                                  self._select)
        epoch = self._client.epoch_ms_fields
        return [convert_row(r, self._schema, epoch) for r in rows]

    def read(self, start: dict):
        # iter(list): the engine needs the iterator PROTOCOL (it calls
        # next()) AND pickles the prefetched cache — a list_iterator
        # satisfies both where a bare list or a generator fails one
        off = int(start["offset"])
        n = self._client.count(self._where)
        if off >= n:
            return iter([]), {"offset": off}
        take = min(self._page, n - off)
        return iter(self._rows(off, take)), {"offset": off + take}

    def readBetweenOffsets(self, start: dict, end: dict):
        off, stop = int(start["offset"]), int(end["offset"])
        if stop <= off:
            return iter([])
        return iter(self._rows(off, stop - off))


class PortalDataSource(DataSource):
    """Base DataSource: subclasses provide `make_client` + `name`.

    Options (all strings, per the Python DS contract):
      url, dataset, date_field, date_format, page_size, nrows, offset,
      select, where (pre-built clause), transport_key (tests).
    """

    _drop: set = frozenset()

    @classmethod
    def make_client(cls, options: dict, transport: Any) -> PortalClient:
        raise NotImplementedError

    def __init__(self, options: dict):
        super().__init__(options)
        self._transport = resolve_transport(options)
        self._client = self.make_client(options, self._transport)

    def _wheres(self) -> list[Where]:
        o = self.options
        if o.get("wheres_json"):
            import json as _json

            return [Where(c, bool(a)) for c, a in _json.loads(o["wheres_json"])]
        parts: list[Where] = []
        if o.get("where"):
            parts.append(Where(o["where"], accurate=o.get("where_accurate", "true") == "true"))
        if o.get("date_start") and o.get("date_stop"):
            fmt = DateFormat(o.get("date_format", "timestamp"))
            start = _dt.datetime.fromisoformat(o["date_start"])
            stop = _dt.datetime.fromisoformat(o["date_stop"])
            dws = build_date_where(o["date_field"], start, stop, fmt, self._client.dialect)
            if parts:
                base = parts[0]
                return [Where(and_wheres(base.clause, w.clause), base.accurate and w.accurate)
                        for w in dws]
            return dws
        return parts

    def schema(self) -> StructType:
        sample = self._client.fetch(0, int(self.options.get("sample_rows", 50)), None)
        st = infer_schema_from_rows(sample, self._client.epoch_ms_fields,
                                    set(self._drop))
        # CRS propagation: geometry columns carry the client's probed CRS
        # (converted Web-Mercator → "EPSG:4326"; raw projections keep
        # their authority:code) so a consumer can tell meters from degrees
        crs = getattr(self._client, "geo_crs", None)
        if crs:
            st = StructType([
                StructField(f.name, f.dataType, f.nullable, {"crs": crs})
                if f.name in ("geo_x", "geo_y")
                or isinstance(f.dataType, StructType) else f
                for f in st.fields
            ])
        return st

    def reader(self, schema: StructType) -> PortalReader:
        o = self.options
        return PortalReader(
            self._client,
            schema,
            self._wheres(),
            page_size=int(o.get("page_size", self._client.max_page)),
            nrows=int(o["nrows"]) if o.get("nrows") else None,
            offset=int(o.get("offset", 0)),
            select=o.get("select"),
        )

    def simpleStreamReader(self, schema: StructType) -> PortalStreamReader:
        o = self.options
        wheres = self._wheres()
        if len(wheres) > 1:
            # the text-date LIKE families expand into several clauses,
            # each with its own count — a single linear stream offset
            # can't window them; pre-filter upstream or use timestamp
            # date formats for streamed datasets
            raise ValueError(
                "streaming portal ingest supports at most one WHERE "
                f"clause (got {len(wheres)} — a multi-clause text-date "
                "family); use a timestamp date_format or drop the "
                "date filter")
        return PortalStreamReader(
            self._client,
            schema,
            wheres[0].clause if wheres else None,
            page_size=int(o.get("page_size", self._client.max_page)),
            select=o.get("select"),
        )
