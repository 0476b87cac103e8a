"""Loader ABC and shared date/agency filter semantics.

Parity target: /root/reference/openpolicedata/data_loaders/data_loader.py —
`Data_Loader` ABC (data_loader.py:297-378), `_clean_date_input`
(data_loader.py:69-101), `_filter_dataframe` (data_loader.py:120-191),
`_process_date` (data_loader.py:104-117).

Spark mapping: the reference filters a loaded pandas frame row-by-row; here
filters are *Column expressions* attached to a lazy DataFrame so Catalyst
pushes them into the scan (PushedFilters on parquet, $where/SQL on portal
readers). The date-input normalization is identical driver-side logic.
"""

from __future__ import annotations

import datetime as _dt
import numbers
import warnings
from abc import ABC, abstractmethod
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openpolicedata_spark import defs

DateInput = int | str | _dt.date | _dt.datetime | Sequence | None


def clean_date_input(date: DateInput) -> Optional[list[_dt.datetime]]:
    """Normalize a date filter request into ``[start, stop]`` datetimes
    (reference data_loader.py:69-101).

    Accepted: None / MULTI / NA sentinels → None; a single year (int or
    digit-string) → [Jan 1, Dec 31]; a single date → [d, d]; a length-2 list
    mixing years/dates/datetimes. Times are floored to midnight with a
    warning (the reference ignores times in filters).
    """
    if date is None or (isinstance(date, str) and date in (defs.MULTI, defs.NA)):
        return None

    vals = list(date) if isinstance(date, (list, tuple)) else [date, date]
    if len(vals) != 2:
        raise ValueError("List of start/stop dates must have length 2")

    out: list[_dt.datetime] = []
    for k, v in enumerate(vals):
        if isinstance(v, str) and v.isdigit():
            v = int(v)
        if isinstance(v, numbers.Number):
            if 999 < v < 10000 and v == round(v):  # a year
                v = f"{int(v)}-01-01" if k == 0 else f"{int(v)}-12-31"
            else:
                raise ValueError(f"Unable to parse number {v} as a year")
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        elif isinstance(v, _dt.datetime):
            pass
        elif isinstance(v, _dt.date):
            v = _dt.datetime(v.year, v.month, v.day)
        floored = v.replace(hour=0, minute=0, second=0, microsecond=0)
        if floored != v:
            warnings.warn(
                f"Times in date filter requests are ignored. Changing {v} to {floored}"
            )
            v = floored
        out.append(v)

    if out[0] > out[1]:
        raise ValueError(f"Start date must be <= stop date. Invalid input: {date}")
    return out


def _is_year_column(df: DataFrame, date_field: str) -> bool:
    """Heuristic from reference data_loader.py:151-155: the column is a year
    if named 'year', or is integer-typed with all values in [1900, 2200].
    The all-values check runs as one distributed aggregate, not a collect."""
    if date_field.lower() == "year":
        return True
    dtype = dict(df.dtypes).get(date_field, "")
    if dtype in ("int", "bigint", "smallint", "tinyint"):
        row = df.agg(
            F.min(date_field).alias("lo"), F.max(date_field).alias("hi")
        ).first()
        return row.lo is not None and row.lo >= 1900 and row.hi <= 2200
    return False


def date_filter_expr(
    date_field: str,
    date_range: list[_dt.datetime],
    is_year: bool = False,
) -> Column:
    """Build the date-range predicate (reference data_loader.py:170-188):
    ``d >= start AND d < stop + 1 day`` for real dates, ``year IN
    [y0..y1]`` for year-valued columns (full-year requests only)."""
    if not is_year:
        stop_excl = date_range[1] + _dt.timedelta(days=1)
        return (F.col(date_field) >= F.lit(date_range[0])) & (
            F.col(date_field) < F.lit(stop_excl)
        )
    if (
        date_range[0] != date_range[0].replace(month=1, day=1)
        or date_range[1] != date_range[1].replace(month=12, day=31)
    ):
        raise ValueError(
            f"Column {date_field} is a year column and cannot be filtered "
            f"by partial-year dates: {date_range}"
        )
    years = list(range(date_range[0].year, date_range[1].year + 1))
    # String year columns compare after cast (reference casts digit strings).
    return F.col(date_field).cast("int").isin(years)


def filter_dataframe(
    df: DataFrame,
    date_field: Optional[str] = None,
    date_filter: DateInput = None,
    agency_field: Optional[str] = None,
    agency: Optional[str] = None,
) -> DataFrame:
    """Apply agency + date filters (reference data_loader.py:120-191) as lazy
    Column predicates — Catalyst pushes them down to the scan."""
    date_range = clean_date_input(date_filter)

    if agency:
        if not agency_field:
            raise ValueError("Agency filtering requested but no agency field was provided")
        df = df.filter(F.col(agency_field) == agency)

    if date_range is not None:
        if not date_field:
            raise ValueError("Date filtering requested but no date field was provided")
        is_year = _is_year_column(df, date_field)
        df = df.filter(date_filter_expr(date_field, date_range, is_year))
    return df


class DataLoader(ABC):
    """Loader interface (reference data_loader.py:297-378): ``load`` returns a
    lazy DataFrame; ``get_count`` / ``get_years`` / ``get_agencies`` are the
    discovery fast-paths. ``isfile`` distinguishes file-backed sources (local
    filtering) from query-API sources (server-side pushdown)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._last_count: Optional[tuple] = None  # memo (reference data_loader.py:449-457)

    @abstractmethod
    def isfile(self) -> bool: ...

    @abstractmethod
    def load(
        self,
        date: DateInput = None,
        nrows: Optional[int] = None,
        offset: int = 0,
        *,
        agency: Optional[str] = None,
        select: Optional[list[str]] = None,
        sortby: Optional[str] = None,
    ) -> DataFrame: ...

    def get_count(self, date: DateInput = None, *, agency: Optional[str] = None,
                  force: bool = False) -> int:
        """Row count with memoization (reference data_loader.py:449-457).
        Subclasses with server-side count pushdown override the slow path."""
        key = (repr(date), agency)
        if not force and self._last_count and self._last_count[0] == key:
            return self._last_count[1]
        n = self.load(date=date, agency=agency).count()
        self._last_count = (key, n)
        return n

    def get_years(self, date_field: Optional[str] = None, *, force: bool = False) -> list[int]:
        """Distinct years present. The reference probes the portal year by
        year with sleeps (data_loader.py:324-378); for loaded data one
        distinct-aggregate query replaces the N-request loop (SURVEY §2.4)."""
        df = self.load()
        if date_field is None:
            raise ValueError("date_field required for get_years")
        dtype = dict(df.dtypes).get(date_field, "")
        col = (
            F.col(date_field).cast("int")
            if dtype in ("int", "bigint", "string") and _is_year_column(df, date_field)
            else F.year(date_field)
        )
        rows = df.select(col.alias("y")).where(F.col("y").isNotNull()).distinct().collect()
        return sorted(r.y for r in rows)

    def get_agencies(self, agency_field: str, partial: Optional[str] = None) -> list[str]:
        """Distinct agency values, optionally LIKE-filtered
        (reference data.py:963-1053, socrata.py:464-472)."""
        df = self.load().select(F.col(agency_field).alias("a")).where(F.col("a").isNotNull())
        if partial:
            df = df.filter(F.lower("a").contains(partial.lower()))
        return sorted(r.a for r in df.distinct().collect())


def apply_limit_offset(df: DataFrame, nrows: Optional[int], offset: int) -> DataFrame:
    """nrows/offset semantics on every load (reference data_loader.py:381-439).
    Spark 3.4+ has a logical OFFSET; combined with LIMIT both are planned
    into the scan where the source supports it."""
    if offset:
        df = df.offset(offset)
    if nrows is not None:
        df = df.limit(nrows)
    return df
