"""Date/time parsing engine: driver-side format detection over samples +
vectorized Column expressions for the bulk conversion.

Parity target: /root/reference/openpolicedata/datetime_parser.py —
`to_datetime` recovery branches (:530-757), `parse_date_to_datetime` numeric
classification (:14-203), `parse_time` (:382-527), `merge_date_and_time`
(:206-228), and data.py:1868-1960 `_check_date` sentinel handling.

Spark mapping (SURVEY §7.9): the reference tries ~20 pandas fallbacks row by
row; here a *sample* (limit 1000 → driver) picks the format strategy once,
then ONE coalesce-of-try_to_timestamp expression converts the whole column
JVM-side. `pd.Period` partial dates become (DateType floor, precision
string) pairs — see ``PERIOD_PRECISIONS``.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PERIOD_PRECISIONS = ("day", "month", "quarter", "year")

# Candidate string formats, ordered: first match in sampling wins
# (mirrors the probe tables in datetime_parser.py:551-644 and
# arcgis_class.py:296-361).
STRING_FORMATS: list[tuple[str, str]] = [
    # (regex on the raw string, Spark datetime pattern)
    (r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}", "yyyy-MM-dd HH:mm:ss"),
    (r"^\d{4}-\d{2}-\d{2}$", "yyyy-MM-dd"),
    (r"^\d{4}/\d{2}/\d{2}$", "yyyy/MM/dd"),
    (r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}:\d{2}", "M/d/yyyy H:mm:ss"),
    (r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}", "M/d/yyyy H:mm"),
    (r"^\d{1,2}/\d{1,2}/\d{4}$", "M/d/yyyy"),
    (r"^\d{1,2}-\d{1,2}-\d{4}$", "M-d-yyyy"),
    (r"^\d{1,2}/\d{1,2}/\d{2}$", "M/d/yy"),
    (r"^\d{8}$", "yyyyMMdd"),
    (r"^[A-Za-z]{3} \d{1,2}, \d{4}$", "MMM d, yyyy"),
    (r"^[A-Za-z]{3,9} \d{1,2}, \d{4}$", "MMMM d, yyyy"),
    (r"^\d{1,2} [A-Za-z]{3} \d{4}$", "d MMM yyyy"),
    # '11/05/2025 1430 hours' (reference datetime_parser.py:562-571)
    (r"(?i)^\d{1,2}/\d{1,2}/\d{4} \d{3,4} *(hours|hrs)\.?$", "__hours__"),
]


def _classify_numeric(vals: list[int]) -> Optional[str]:
    """Classify an integer date column by digit-range validity
    (reference datetime_parser.py:44-118): yyyymmdd / mmddyyyy / epoch-s /
    epoch-ms / year."""
    if not vals:
        return None

    def ok_yyyymmdd(v: int) -> bool:
        y, m, d = v // 10000, (v // 100) % 100, v % 100
        return 1900 <= y <= 2200 and 1 <= m <= 12 and 1 <= d <= 31

    def ok_mmddyyyy(v: int) -> bool:
        m, d, y = v // 1000000, (v // 10000) % 100, v % 10000
        return 1900 <= y <= 2200 and 1 <= m <= 12 and 1 <= d <= 31

    if all(1900 <= v <= 2200 for v in vals):
        return "year"
    if all(10**7 <= v < 10**8 and ok_yyyymmdd(v) for v in vals):
        return "yyyymmdd"
    if all(10**7 <= v < 10**8 and ok_mmddyyyy(v) for v in vals):
        return "mmddyyyy"
    # epoch ranges: seconds ~ [1980, 2100] → [3.2e8, 4.1e9]; ms 1000×
    if all(3 * 10**8 < v < 4.2 * 10**9 for v in vals):
        return "epoch_s"
    if all(3 * 10**11 < v < 4.2 * 10**12 for v in vals):
        return "epoch_ms"
    return None


def detect_date_format(df: DataFrame, col: str, sample_n: int = 1000) -> dict:
    """Driver-side planning probe: sample non-null values and pick a parse
    strategy. Returns {'kind': ..., 'formats': [...]} consumed by
    `to_datetime_expr`. One small job (limit → collect), never a full scan —
    the analog of the reference's probes (socrata.py:524-636,
    datetime_parser.py:14-203)."""
    dtype = dict(df.dtypes).get(col, "")
    if dtype.startswith(("timestamp", "date")):
        return {"kind": "native"}
    rows = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .limit(sample_n)
        .collect()
    )
    vals = [r.v for r in rows]
    if dtype in ("int", "bigint", "smallint", "double", "float"):
        ints = [int(v) for v in vals if v is not None]
        kind = _classify_numeric(ints)
        return {"kind": kind or "unknown"}
    # string column: vote across candidate formats
    fmts: list[str] = []
    svals = [str(v).strip() for v in vals if str(v).strip()]
    # glued 8-digit strings are ambiguous (yyyymmdd vs mmddyyyy): decide by
    # digit-range validity, like the numeric branch (datetime_parser.py:44-118)
    if svals and all(re.match(r"^\d{8}$", v) for v in svals):
        def ok_ymd(v):
            return (1900 <= int(v[:4]) <= 2200 and 1 <= int(v[4:6]) <= 12
                    and 1 <= int(v[6:]) <= 31)

        def ok_mdy(v):
            return (1 <= int(v[:2]) <= 12 and 1 <= int(v[2:4]) <= 31
                    and 1900 <= int(v[4:]) <= 2200)

        # digit-position validity, on the STRING (leading zeros survive)
        if all(ok_ymd(v) for v in svals):
            return {"kind": "yyyymmdd"}
        if all(ok_mdy(v) for v in svals):
            return {"kind": "mmddyyyy"}
    for rx, fmt in STRING_FORMATS:
        p = re.compile(rx)
        n = sum(1 for v in svals if p.match(v))
        if n and n >= 0.5 * len(svals):
            fmts.append(fmt)
    masked = any(re.match(r"^\d{4}[-/]_+[-/]_+", v) for v in svals)
    if fmts or masked:
        return {"kind": "string", "formats": fmts, "masked": masked}
    if svals and all(re.match(r"^\d{4}$", v) for v in svals):
        return {"kind": "year"}
    if svals and all(re.match(r"^\d{4}-\d{2}$", v) for v in svals):
        return {"kind": "year_month"}
    # 'YYYY Q#' quarters (reference datetime_parser.py:600-616 → Period Q;
    # also the Socrata yyyyq WHERE dialect, socrata.py:404-419)
    if svals and all(re.match(r"^\d{4}\s*Q[1-4]$", v, re.I) for v in svals):
        return {"kind": "year_quarter"}
    return {"kind": "unknown"}


def to_datetime_expr(col: Column, strategy: Optional[dict] = None,
                     formats: Optional[list[str]] = None) -> Column:
    """Vectorized conversion to timestamp using a detected strategy
    (reference `to_datetime` datetime_parser.py:530-757 → one coalesce of
    try_to_timestamp attempts; no row-wise Python)."""
    if formats is not None:
        strategy = {"kind": "string", "formats": formats}
    strategy = strategy or {}
    kind = strategy.get("kind", "unknown")
    if kind == "native":
        return col.cast("timestamp")
    if kind == "year":
        return F.make_timestamp(col.cast("int"), F.lit(1), F.lit(1),
                                F.lit(0), F.lit(0), F.lit(0))
    if kind == "year_month":
        s = col.cast("string")
        return F.make_timestamp(
            F.substring(s, 1, 4).cast("int"), F.substring(s, 6, 2).cast("int"),
            F.lit(1), F.lit(0), F.lit(0), F.lit(0),
        )
    if kind == "year_quarter":
        s_q = F.upper(F.trim(col.cast("string")))
        q = F.regexp_extract(s_q, r"Q([1-4])$", 1).cast("int")
        return F.make_timestamp(
            F.substring(s_q, 1, 4).cast("int"),
            (q - 1) * 3 + 1, F.lit(1), F.lit(0), F.lit(0), F.lit(0))
    if kind == "yyyymmdd":
        v = col.cast("long")
        return F.make_timestamp((v / 10000).cast("int"),
                                ((v / 100) % 100).cast("int"),
                                (v % 100).cast("int"),
                                F.lit(0), F.lit(0), F.lit(0))
    if kind == "mmddyyyy":
        v = col.cast("long")
        return F.make_timestamp((v % 10000).cast("int"),
                                (v / 1000000).cast("int"),
                                ((v / 10000) % 100).cast("int"),
                                F.lit(0), F.lit(0), F.lit(0))
    if kind == "epoch_s":
        return F.timestamp_seconds(col.cast("long"))
    if kind == "epoch_ms":
        return F.timestamp_millis(col.cast("long"))
    # string with known formats, or unknown → try the whole candidate list
    fmts = strategy.get("formats") or [f for _, f in STRING_FORMATS]
    s = F.trim(col.cast("string"))
    # comma-separated date LISTS take the first entry (reference
    # datetime_parser.py:698-706). Only trigger on an actual list of
    # slash/dash dates — a loose `anything,digit` test would truncate
    # 'Jan 15, 2024' to 'Jan 15' and break the MMM d, yyyy formats.
    is_date_list = s.rlike(r"^\d{1,4}[-/]\d{1,2}[-/]\d{1,4}\s*,\s*\d{1,4}[-/]")
    s = F.when(is_date_list, F.trim(F.split(s, ",")[0])).otherwise(s)
    attempts = []
    for f in fmts:
        if f == "__hours__":
            # '11/05/2025 1430 hours' → strip suffix, parse M/d/yyyy HHmm
            cleaned = F.regexp_replace(s, r"(?i)\s*(hours|hrs)\.?$", "")
            attempts.append(F.try_to_timestamp(cleaned, F.lit("M/d/yyyy HHmm")))
        else:
            attempts.append(F.try_to_timestamp(s, F.lit(f)))
    attempts.append(F.try_to_timestamp(s))  # ISO fallback
    # masked partial dates '2023-__-__' floor to Jan-1 (year precision;
    # reference datetime_parser.py:643-652 → Period)
    attempts.append(
        F.when(s.rlike(r"^\d{4}[-/]_+[-/]_+"),
               F.make_timestamp(F.substring(s, 1, 4).cast("int"), F.lit(1),
                                F.lit(1), F.lit(0), F.lit(0), F.lit(0))))
    # trailing Z / fractional seconds: normalize then ISO-parse
    attempts.append(F.try_to_timestamp(F.regexp_replace(s, r"[Zz]$", "")))
    return F.coalesce(*attempts)


def check_date_expr(ts: Column, sentinel: str = "1900-01-01") -> Column:
    """Post-load normalization (reference `_check_date` data.py:1868-1960):
    null out the publisher sentinel date."""
    return F.when(ts.cast("date") == F.lit(sentinel).cast("date"), None).otherwise(ts)


# --------------------------------------------------------------------------
# time of day
# --------------------------------------------------------------------------


def parse_time_expr(col: Column) -> Column:
    """Parse a time-of-day column to *seconds since midnight* (int).

    Handles (reference `parse_time` datetime_parser.py:382-527):
    HHMM integers (2400→0; 9999/999 error codes→null), 'HH:MM(:SS)' strings
    (';'/'.' typo delimiters), 'h:mm AM/PM' (12AM→0, typo '13PM'), embedded
    'T' datetime fragments, junk → null.
    """
    s = F.upper(F.trim(col.cast("string")))
    # strip a leading date + 'T' (embedded datetime)
    s = F.regexp_replace(s, r"^\d{4}-\d{2}-\d{2}T", "")
    # normalize typo delimiters ; . → :
    s = F.regexp_replace(s, r"[;.](?=\d{2}(:|$))", ":")

    is_ampm = s.rlike(r"^\d{1,2}(:\d{2})?(:\d{2})?\s*[AP]\.?M\.?$")
    ampm_h = F.regexp_extract(s, r"^(\d{1,2})", 1).try_cast("int")
    ampm_m = F.coalesce(F.regexp_extract(s, r":(\d{2})", 1).try_cast("int"), F.lit(0))
    is_pm = s.rlike(r"P\.?M\.?$")
    h12 = (
        F.when(is_pm & (ampm_h < 12), ampm_h + 12)
        .when(~is_pm & (ampm_h == 12), F.lit(0))
        .when(ampm_h == 13, F.lit(13))  # '13PM' typo → 13 (reference keeps hour)
        .otherwise(ampm_h)
    )
    ampm_secs = h12 * 3600 + ampm_m * 60

    is_colon = s.rlike(r"^\d{1,2}:\d{2}(:\d{2})?$")
    parts = F.split(s, ":")
    c_h = F.try_element_at(parts, F.lit(1)).try_cast("int")
    c_m = F.coalesce(F.try_element_at(parts, F.lit(2)).try_cast("int"), F.lit(0))
    c_s = F.coalesce(F.try_element_at(parts, F.lit(3)).try_cast("int"), F.lit(0))
    colon_secs = c_h * 3600 + c_m * 60 + c_s

    is_hhmm = s.rlike(r"^\d{1,4}$")
    v = s.try_cast("int")  # try_cast: ANSI mode errors on junk strings
    hh = (v / 100).cast("int")
    mm = v % 100
    hhmm_secs = (
        F.when((v == 2400), F.lit(0))
        .when((v == 9999) | (v == 999), F.lit(None))
        .when((hh <= 23) & (mm <= 59), hh * 3600 + mm * 60)
        .otherwise(F.lit(None))
    )

    out = (
        F.when(col.isNull(), F.lit(None))
        .when(is_ampm & (h12 <= 23) & (ampm_m <= 59), ampm_secs)
        .when(is_colon & (c_h <= 23) & (c_m <= 59) & (c_s <= 59), colon_secs)
        .when(is_hhmm, hhmm_secs)
        .otherwise(F.lit(None))
    )
    return out.cast("int")


def merge_date_time_expr(date_col: Column, time_secs: Column,
                         empty_time: str = "nat") -> Column:
    """date + seconds-since-midnight → timestamp (reference
    `merge_date_and_time` datetime_parser.py:206-228). ``empty_time='nat'``
    nulls rows lacking a time; ``'ignore'`` keeps the bare date."""
    if empty_time.lower() not in ("nat", "ignore"):
        raise ValueError(
            f"empty_time must be 'nat' or 'ignore', got {empty_time!r}")
    merged = F.timestamp_seconds(
        F.unix_timestamp(date_col.cast("timestamp")) + time_secs.cast("long")
    )
    if empty_time.lower() == "nat":
        return F.when(time_secs.isNull(), None).otherwise(merged)
    return F.when(time_secs.isNull(), date_col.cast("timestamp")).otherwise(merged)


def epoch_expr(col: Column, unit: str = "ms") -> Column:
    """Esri epoch fields (reference arcgis_class.py:516-524 converts ms
    epochs)."""
    return (
        F.timestamp_millis(col.cast("long"))
        if unit == "ms"
        else F.timestamp_seconds(col.cast("long"))
    )


def date_precision_row_expr(raw: Column, strategy: Optional[dict] = None) -> Column:
    """PER-ROW precision for string columns that mix full and masked dates:
    '2023-__-__' rows are year-precision, the rest day-precision."""
    base = date_precision_expr(strategy)
    return F.when(
        F.trim(raw.cast("string")).rlike(r"^\d{4}[-/]_+[-/]_+"), F.lit("year")
    ).otherwise(base)


def date_precision_expr(strategy: Optional[dict] = None) -> Column:
    """Companion DATE_PRECISION value for the (date, precision) encoding of
    pd.Period semantics (SURVEY §1.3; reference stores Period('Y'/'M'/'Q')
    for partial dates, data.py:1881-1894). Precision is a property of the
    detected column strategy: 'year' and 'year_month' columns floor to
    Jan-1 / day-1, everything else is day-or-finer."""
    kind = (strategy or {}).get("kind", "unknown")
    if kind == "year":
        return F.lit("year")
    if kind == "year_month":
        return F.lit("month")
    if kind == "year_quarter":
        return F.lit("quarter")
    return F.lit("day")


_PRECISION_MONTHS = {"day": 0, "month": 1, "quarter": 3, "year": 12}


def period_overlap_filter(date_col: Column, precision_col: Column,
                          start: str, stop: str) -> Column:
    """Filter respecting period semantics: a year-precision value
    2020-01-01 matches any range intersecting calendar-2020 (reference
    interval containment, data.py:1337-1356). The period END is
    date + precision-length - 1s; overlap = p_start <= stop AND
    p_end >= start. Day precision degenerates to a plain between."""
    start_ts = F.lit(start).cast("timestamp_ntz")
    stop_ts = F.lit(stop).cast("timestamp_ntz")
    months = F.coalesce(
        *[F.when(precision_col == k, F.lit(v))
          for k, v in _PRECISION_MONTHS.items()],
        F.lit(0),
    )
    p_end = F.when(
        months > 0,
        F.timestamp_add("SECOND", F.lit(-1),
                        F.timestamp_add("MONTH", months, date_col)),
    ).otherwise(F.timestamp_add("SECOND", F.lit(86399), date_col))
    return (date_col <= stop_ts) & (p_end >= start_ts)
