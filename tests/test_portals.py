"""Offline end-to-end tests for the five REST portal data sources.

Mirrors the reference's per-portal load/count/filter-consistency oracles
(reference tests/1_unit_data_source_loading/*, SURVEY.md §5) with the
network replaced by in-package fake portal servers."""

from __future__ import annotations

import datetime as dt

import pytest

from openpolicedata_spark.sources.portals.testing import FakePortal, make_rows
from openpolicedata_spark.sources.portals.transport import FakeTransport
from openpolicedata_spark.sources.portals.where import (
    DateFormat,
    Dialect,
    Where,
    build_date_where,
)
from openpolicedata_spark.sources.rest import RestLoader

PORTALS = [
    ("opd_socrata", "socrata", "https://fake.portal.test", "abcd-1234"),
    ("opd_arcgis", "arcgis", "https://fake.portal.test/FeatureServer/0", ""),
    ("opd_ckan", "ckan", "https://fake.portal.test", "resource-1"),
    ("opd_carto", "carto", "https://fake.portal.test", "incidents"),
    ("opd_ods", "ods", "https://fake.portal.test", "incidents"),
]


def _loader(spark, fmt, portal, url, ds, date_text="iso", **kw):
    date_format = {
        "iso": DateFormat.TIMESTAMP,
        "epoch_ms": DateFormat.EPOCH_MS,
        "yyyymmdd": DateFormat.YYYYMMDD_TEXT,
        "mmddyyyy": DateFormat.MMDDYYYY_TEXT,
        "month_abbrev": DateFormat.MONTH_ABBREV_TEXT,
        "yyyyq": DateFormat.YYYYQ_TEXT,
        "year": DateFormat.YEAR_NUMERIC,
    }[date_text]
    server = FakePortal(portal, date_text=date_text)
    loader = RestLoader(
        spark,
        format_name=fmt,
        url=url,
        dataset=ds,
        date_field="incident_date",
        agency_field="agency",
        date_format=date_format.value,
        transport=FakeTransport(handler=server),
        **kw,
    )
    return loader, server


def _year(r, date_text):
    d = r["incident_date"]
    if date_text == "epoch_ms":
        return dt.datetime.utcfromtimestamp(d / 1000).year
    if date_text == "iso":
        return int(str(d)[:4])
    raise NotImplementedError


@pytest.mark.parametrize("fmt,portal,url,ds", PORTALS)
def test_portal_full_load(spark, fmt, portal, url, ds):
    loader, server = _loader(spark, fmt, portal, url, ds)
    df = loader.load()
    assert df.count() == len(server.rows)
    got = {r.case_id for r in df.select("case_id").collect()}
    assert got == {r["case_id"] for r in server.rows}
    # schema inference: value → numeric, date → timestamp (iso portals)
    dtypes = dict(df.dtypes)
    assert dtypes["value"] in ("bigint", "double")
    assert dtypes["incident_date"].startswith("timestamp")


@pytest.mark.parametrize("fmt,portal,url,ds", PORTALS)
def test_portal_year_filter_and_count(spark, fmt, portal, url, ds):
    date_text = "epoch_ms" if portal == "arcgis" else "iso"
    loader, server = _loader(spark, fmt, portal, url, ds, date_text=date_text)
    expected = [r for r in server.rows if _year(r, date_text) == 2020]
    df = loader.load(2020)
    assert df.count() == len(expected) > 0
    # count fast-path (no Spark job) must agree with the loaded count
    assert loader.get_count(2020, force=True) == len(expected)
    # consistency oracle: with-filter result ⊆ without-filter result
    full_ids = {r["case_id"] for r in server.rows}
    got_ids = {r.case_id for r in df.select("case_id").collect()}
    assert got_ids <= full_ids


@pytest.mark.parametrize("fmt,portal,url,ds", PORTALS)
def test_portal_paging_partitions(spark, fmt, portal, url, ds):
    loader, server = _loader(spark, fmt, portal, url, ds, page_size=75)
    df = loader.load()
    # 300 rows at page 75 → 4 page partitions fetched in parallel
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 300
    ids = sorted(r.case_id for r in df.collect())
    assert ids == sorted(r["case_id"] for r in server.rows)


def test_portal_nrows_offset(spark):
    loader, server = _loader(spark, *PORTALS[0][:1], "socrata",
                             "https://fake.portal.test", "abcd-1234")
    df = loader.load(nrows=20, offset=10)
    rows = sorted(r.case_id for r in df.collect())
    assert rows == sorted(r["case_id"] for r in server.rows[10:30])


def test_portal_agency_pushdown(spark):
    fmt, portal, url, ds = PORTALS[2]
    loader, server = _loader(spark, fmt, portal, url, ds)
    df = loader.load(agency="Springfield PD")
    expected = [r for r in server.rows if r["agency"] == "Springfield PD"]
    assert df.count() == len(expected)
    assert loader.get_count(agency="Springfield PD", force=True) == len(expected)


def test_portal_get_years_probe(spark):
    loader, _ = _loader(spark, *PORTALS[0][:1], "socrata",
                        "https://fake.portal.test", "abcd-1234")
    assert loader.get_years("incident_date") == [2019, 2020, 2021]


def test_portal_get_agencies_distinct_fastpath(spark):
    loader, server = _loader(spark, *PORTALS[0][:1], "socrata",
                             "https://fake.portal.test", "abcd-1234")
    assert loader.get_agencies("agency") == sorted(
        {r["agency"] for r in server.rows})
    assert loader.get_agencies("agency", partial="spring") == ["Springfield PD"]


@pytest.mark.parametrize("date_text", ["yyyymmdd", "mmddyyyy", "month_abbrev", "yyyyq"])
def test_text_date_pushdown_with_residual(spark, date_text):
    """Inaccurate text-date WHERE over-selects; the residual local filter
    must restore exact [start, stop] semantics (reference
    data_loader.py:41-66)."""
    loader, server = _loader(spark, "opd_socrata", "socrata",
                             "https://fake.portal.test", "abcd-1234",
                             date_text=date_text)
    iso_rows = make_rows(date_text="iso")
    # full-year query
    expected_2020 = {r["case_id"] for r in iso_rows if str(r["incident_date"]).startswith("2020")}
    got = {r.case_id for r in loader.load(2020).select("case_id").collect()}
    assert got == expected_2020
    # sub-year range forces residual filtering for non-lexicographic formats
    rng = ["2020-03-01", "2020-06-30"]
    if date_text == "yyyyq":
        # quarter precision → period-overlap semantics: Q1 (Jan-Mar)
        # intersects a range starting Mar 1 (reference pd.Period behavior)
        expected = {r["case_id"] for r in iso_rows
                    if "2020-01-01" <= str(r["incident_date"])[:10] <= "2020-06-30"}
    else:
        expected = {r["case_id"] for r in iso_rows
                    if "2020-03-01" <= str(r["incident_date"])[:10] <= "2020-06-30"}
    got = {r.case_id for r in loader.load(rng).select("case_id").collect()}
    assert got == expected


def test_where_builder_accuracy_flags():
    start, stop = dt.datetime(2020, 3, 1), dt.datetime(2020, 6, 30)
    ws = build_date_where("d", start, stop, DateFormat.MMDDYYYY_TEXT, Dialect.SOQL)
    assert all(not w.accurate for w in ws)
    ws = build_date_where("d", dt.datetime(2020, 1, 1), dt.datetime(2021, 12, 31),
                          DateFormat.MMDDYYYY_TEXT, Dialect.SOQL)
    assert [w.accurate for w in ws] == [True, True]
    ws = build_date_where("d", start, stop, DateFormat.YYYYMMDD_TEXT, Dialect.SQL)
    assert len(ws) == 1 and ws[0].accurate
    ws = build_date_where("d", start, stop, DateFormat.TIMESTAMP, Dialect.ARCGIS)
    assert "TIMESTAMP '2020-03-01 00:00:00'" in ws[0].clause


def test_reader_pushfilters_translation(spark):
    """Catalyst filters on a portal scan → WHERE fragments; unsupported
    filters come back as residuals (driver-side unit)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

    from openpolicedata_spark.sources.portals.core import PortalReader
    from openpolicedata_spark.sources.portals.socrata import SocrataClient

    client = SocrataClient(transport=FakeTransport(handler=FakePortal("socrata")),
                           url="https://x", dataset="d")
    reader = PortalReader(client, None, [Where(None)], page_size=100)
    residual = list(reader.pushFilters([
        EqualTo(("agency",), "Springfield PD"),
        GreaterThan(("value",), 50),
        IsNotNull(("category",)),
    ]))
    assert reader._pushed == ["agency = 'Springfield PD'", "value > 50"]
    assert len(residual) == 1 and isinstance(residual[0], IsNotNull)


def test_reader_multi_where_offset_bookkeeping():
    """nrows/offset split across multiple WHERE clauses (reference
    _setup_records_request data_loader.py:381-439)."""
    from openpolicedata_spark.sources.portals.core import PortalReader
    from openpolicedata_spark.sources.portals.socrata import SocrataClient

    server = FakePortal("socrata", date_text="mmddyyyy")
    client = SocrataClient(transport=FakeTransport(handler=server),
                           url="https://x", dataset="d")
    wheres = [Where("incident_date LIKE '%/2019'", False),
              Where("incident_date LIKE '%/2020'", False)]
    n2019 = sum(1 for r in server.rows if str(r["incident_date"]).endswith("/2019"))
    reader = PortalReader(client, None, wheres, page_size=50,
                          nrows=60, offset=n2019 - 10)
    specs = reader.partitions()
    # 10 rows left in clause 1, 50 from clause 2
    assert sum(s.limit for s in specs) == 60
    assert specs[0].offset == n2019 - 10 and specs[0].limit == 10
    assert specs[1].offset == 0 and specs[1].limit == 50


def test_spark_sql_filter_on_portal_scan(spark):
    """Full pushFilters round trip through Catalyst: a .filter on the scan
    returns exactly the matching rows."""
    loader, server = _loader(spark, *PORTALS[0][:1], "socrata",
                             "https://fake.portal.test", "abcd-1234")
    from pyspark.sql import functions as F

    df = loader.load().filter((F.col("value") > 50) & (F.col("agency") == "Shelbyville PD"))
    expected = [r for r in server.rows
                if r["value"] > 50 and r["agency"] == "Shelbyville PD"]
    assert df.count() == len(expected)


def test_probe_date_format_classifies_all_portal_formats(spark):
    """Driver-side date-format probe (reference __date_format_search /
    _find_string_type_date_query_format) over one sampled page."""
    from openpolicedata_spark.sources.portals.probe import probe_date_format
    from openpolicedata_spark.sources.portals.socrata import SocrataClient

    expected = {
        "iso": DateFormat.TIMESTAMP,
        "epoch_ms": DateFormat.EPOCH_MS,
        "yyyymmdd": DateFormat.YYYYMMDD_TEXT,
        "mmddyyyy": DateFormat.MMDDYYYY_TEXT,
        "month_abbrev": DateFormat.MONTH_ABBREV_TEXT,
        "yyyyq": DateFormat.YYYYQ_TEXT,
        "year": DateFormat.YEAR_NUMERIC,
    }
    for date_text, fmt in expected.items():
        client = SocrataClient(
            transport=FakeTransport(handler=FakePortal("socrata", date_text=date_text)),
            url="https://x", dataset="d")
        got = probe_date_format(client, "incident_date")
        assert got == fmt, f"{date_text}: got {got}"


def test_rest_loader_auto_probes_date_format(spark):
    """A RestLoader constructed without date_format probes the portal and
    still answers an exact year query over a text-date column."""
    server = FakePortal("socrata", date_text="yyyymmdd")
    loader = RestLoader(
        spark, format_name="opd_socrata", url="https://x", dataset="d",
        date_field="incident_date", date_format="auto",
        transport=FakeTransport(handler=server),
    )
    iso = make_rows(date_text="iso")
    expected = {r["case_id"] for r in iso if str(r["incident_date"]).startswith("2020")}
    got = {r.case_id for r in loader.load(2020).select("case_id").collect()}
    assert got == expected


def test_socrata_geolocation_to_point_struct(spark):
    """Socrata geolocation dicts become struct<lon,lat> columns (SURVEY
    §1.3 geometry mapping; reference builds GeoDataFrames,
    socrata.py:476-504)."""
    server = FakePortal("socrata")
    for i, r in enumerate(server.rows):
        r["geolocation"] = ({"latitude": str(30 + i % 10), "longitude": str(-90 - i % 10)}
                            if i % 3 else {"type": "Point",
                                           "coordinates": [-90 - i % 10, 30 + i % 10]})
    loader = RestLoader(
        spark, format_name="opd_socrata", url="https://x", dataset="d",
        transport=FakeTransport(handler=server),
    )
    df = loader.load()
    assert dict(df.dtypes)["geolocation"] == "struct<lon:double,lat:double>"
    row = df.where(df.case_id == "C00004").first()
    assert row.geolocation.lat == 34.0 and row.geolocation.lon == -94.0


def test_arcgis_web_mercator_converted_to_lonlat(spark):
    """A Web-Mercator layer (wkid 102100) serves x/y in METERS; the client
    must convert to lon/lat degrees (reference carries the wkid into a
    GeoDataFrame CRS, arcgis_class.py:485,516-546) and record EPSG:4326
    in the geometry columns' metadata."""
    import math

    R = 6378137.0

    def fwd(lon, lat):  # forward spherical mercator
        return (R * math.radians(lon),
                R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)))

    pts = {1: (-122.3321, 47.6062), 2: (2.3522, 48.8566), 3: (0.0, 0.0)}
    rows = [dict(case_id=i, agency="A", value=i,
                 _geo_x=fwd(*p)[0], _geo_y=fwd(*p)[1])
            for i, p in pts.items()]
    server = FakePortal("arcgis", rows=rows, wkid=102100)
    loader = RestLoader(
        spark, format_name="opd_arcgis",
        url="https://fake.portal.test/FeatureServer/0", dataset="",
        date_field=None, agency_field="agency",
        transport=FakeTransport(handler=server))
    df = loader.load()
    got = {r.case_id: (r.geo_x, r.geo_y) for r in df.collect()}
    for i, (lon, lat) in pts.items():
        assert got[i][0] == pytest.approx(lon, abs=1e-9)
        assert got[i][1] == pytest.approx(lat, abs=1e-9)
    meta = {f.name: f.metadata for f in df.schema.fields}
    assert meta["geo_x"].get("crs") == "EPSG:4326"
    assert meta["geo_y"].get("crs") == "EPSG:4326"


def test_arcgis_wgs84_layer_passthrough(spark):
    """A wkid-4326 layer's x/y are already degrees — passed through
    untouched, metadata EPSG:4326; an exotic projected layer passes raw
    values with its authority code so meters are never mislabeled."""
    rows = [dict(case_id=1, agency="A", value=1, _geo_x=-71.06, _geo_y=42.36)]
    server = FakePortal("arcgis", rows=rows, wkid=4326)
    loader = RestLoader(
        spark, format_name="opd_arcgis",
        url="https://fake.portal.test/FeatureServer/0", dataset="",
        date_field=None, agency_field="agency",
        transport=FakeTransport(handler=server))
    df = loader.load()
    r = df.collect()[0]
    assert (r.geo_x, r.geo_y) == (-71.06, 42.36)
    assert {f.name: f.metadata for f in df.schema.fields}["geo_x"][
        "crs"] == "EPSG:4326"

    # state-plane-ish ESRI wkid: raw passthrough, ESRI authority recorded
    server2 = FakePortal("arcgis", rows=[dict(
        case_id=1, agency="A", value=1, _geo_x=398156.2, _geo_y=136874.1)],
        wkid=102685)
    loader2 = RestLoader(
        spark, format_name="opd_arcgis",
        url="https://fake.portal.test/FeatureServer/0", dataset="",
        date_field=None, agency_field="agency",
        transport=FakeTransport(handler=server2))
    df2 = loader2.load()
    r2 = df2.collect()[0]
    assert (r2.geo_x, r2.geo_y) == (398156.2, 136874.1)
    assert {f.name: f.metadata for f in df2.schema.fields}["geo_x"][
        "crs"] == "ESRI:102685"


def test_rest_load_select_projects_result(spark):
    """select= must project the RESULT, not only push $select: the
    sampled schema covers every column, so without the projection the
    non-selected columns come back as silent all-null fields."""
    loader, _ = _loader(spark, "opd_socrata", "socrata",
                        "https://fake.portal.test", "abcd-1234")
    df = loader.load(select=["case_id", "agency"])
    assert set(df.columns) == {"case_id", "agency"}
    assert df.count() > 0


def test_rest_load_select_with_inaccurate_date_still_filters(spark):
    """Inaccurate text-date pushdown + a select that omits the date
    column: the residual filter must still apply exactly (the date column
    is fetched internally, then dropped)."""
    loader, server = _loader(spark, "opd_socrata", "socrata",
                             "https://fake.portal.test", "abcd-1234",
                             date_text="mmddyyyy")
    df = loader.load(date=2020, select=["case_id"])
    assert df.columns == ["case_id"]
    want = sum(1 for r in server.rows
               if r["incident_date"].endswith("/2020"))
    assert df.count() == want


def test_month_abbrev_partial_month_is_not_marked_accurate(spark):
    """date range ending Mar 28: the old stop.day >= 28 heuristic claimed
    month-accuracy and leaked Mar 29-31 rows past the skipped residual
    filter."""
    loader, server = _loader(spark, "opd_socrata", "socrata",
                             "https://fake.portal.test", "abcd-1234",
                             date_text="month_abbrev")
    rng = ["2020-01-01", "2020-03-28"]
    df = loader.load(date=rng)
    import pandas as _pd

    lo, hi = _pd.Timestamp("2020-01-01"), _pd.Timestamp("2020-03-28")
    # the portal's month-abbrev values carry day precision
    # ('Mar 29, 2020'), so the residual filter is day-exact: Mar 29-31
    # rows matched by the '%Mar%2020%' LIKE must be filtered back out —
    # which only happens because the clause is no longer marked accurate
    want = 0
    for r in server.rows:
        d = _pd.to_datetime(r["incident_date"], format="%b %d, %Y")
        if lo <= d <= hi:
            want += 1
    n_mar = sum(1 for r in server.rows
                if "Mar" in r["incident_date"]
                and ", 2020" in r["incident_date"])
    assert n_mar > want - sum(
        1 for r in server.rows
        if _pd.to_datetime(r["incident_date"], format="%b %d, %Y")
        < _pd.Timestamp("2020-03-01"))  # some Mar 29-31 rows exist
    assert df.count() == want


def test_boolean_filter_not_pushed_as_string(spark):
    """A boolean == filter must stay a Spark-side residual (portals have
    no universal boolean literal; the string fallback would render
    = 'True' and silently match nothing)."""
    import pyspark.sql.functions as _F

    rows = make_rows(40)
    for i, r in enumerate(rows):
        r["resolved"] = (i % 3 == 0)
    server = FakePortal("socrata", rows=rows)
    loader = RestLoader(
        spark, format_name="opd_socrata", url="https://fake.portal.test",
        dataset="abcd-1234", date_field="incident_date",
        agency_field="agency",
        date_format=DateFormat.TIMESTAMP.value,
        transport=FakeTransport(handler=server),
    )
    df = loader.load().filter(_F.col("resolved") == True)  # noqa: E712
    assert df.count() == sum(1 for r in rows if r["resolved"])
