"""Round 13: streaming portal ingest — the incremental face of the
batch pager via Spark 4's Python streaming data source API
(PortalStreamReader / RestLoader.load_stream)."""

from __future__ import annotations

import json

import pytest

from openpolicedata_spark.sources.portals.testing import FakePortal, make_rows
from openpolicedata_spark.sources.portals.transport import FakeTransport
from openpolicedata_spark.sources.rest import RestLoader


def _loader(spark, server, **kw):
    return RestLoader(
        spark,
        format_name="opd_socrata",
        url="fake.portal",
        dataset="abcd-1234",
        date_field="incident_date",
        agency_field="agency",
        transport=FakeTransport(handler=server),
        **kw,
    )


def _drain_into(stream_df, ck, seen):
    """One availableNow drain collecting (batch_id -> rows) into
    `seen` — keyed by id so an engine replay of a batch overwrites
    instead of double-counting (the source is exactly-once; a
    collecting sink is at-least-once)."""
    q = (stream_df.writeStream
         .foreachBatch(lambda b, bid: seen.__setitem__(
             bid, [tuple(r) for r in b.collect()]))
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
        q.awaitTermination(30)


def test_portal_stream_pages_grow_and_resume(spark, tmp_path):
    """The incremental-ingest law: repeated drains page through the
    portal exactly once (one page per availableNow trigger — the
    measured simple-reader unit), an exhausted portal yields nothing,
    and rows APPENDED to the portal later are picked up from the
    committed offset — never re-fetching the old pages."""
    rows = make_rows(220)
    server = FakePortal("socrata", rows=list(rows))
    ck = str(tmp_path / "ck")
    seen: dict = {}

    def ids():
        return [r[0] for batch in seen.values() for r in batch]

    def drain():
        # a NEW loader each drain re-pickles the CURRENT server state
        # (the plan-time worker gets a snapshot — mutating the driver
        # object would be invisible; checked below)
        s = _loader(spark, server, page_size=100).load_stream()
        assert s.isStreaming
        _drain_into(s.select("case_id"), ck, seen)

    # 3 drains ingest 100 + 100 + 20; the 4th is a no-op
    for expected in (100, 200, 220, 220):
        drain()
        assert len(ids()) == expected, (expected, len(ids()))
    assert sorted(ids()) == sorted(r["case_id"] for r in rows)

    # the portal grows: only the NEW rows arrive, old offsets committed
    extra = make_rows(250)[220:]
    server.rows.extend(extra)
    drain()
    assert len(ids()) == 250
    new_ids = {r["case_id"] for r in extra}
    flat = ids()
    assert set(flat[-30:]) == new_ids
    assert len(flat) == len(set(flat))  # exactly once, ever


def test_portal_stream_replay_refetches_same_window(spark, tmp_path):
    """Failure-recovery replay: dropping a batch's commit record makes
    the engine re-run it through readBetweenOffsets with the SAME
    [start, end) window — identical rows, no drift (the engine replay
    contract the reader implements)."""
    import os

    server = FakePortal("socrata", rows=make_rows(150))
    ck = str(tmp_path / "ck")
    seen: dict = {}

    def drain():
        s = _loader(spark, server, page_size=100).load_stream()
        _drain_into(s.select("case_id"), ck, seen)

    drain()   # batch 0: rows 0-99
    drain()   # batch 1: rows 100-149
    first_b1 = list(seen[1])
    assert len(seen[0]) == 100 and len(first_b1) == 50
    os.remove(os.path.join(ck, "commits", "1"))
    crc = os.path.join(ck, "commits", ".1.crc")
    if os.path.isfile(crc):
        os.remove(crc)
    drain()   # batch 1 REDELIVERED
    assert seen[1] == first_b1
    # and the stream continues cleanly past the replay
    assert sum(len(v) for v in seen.values()) == 150


def test_portal_stream_filter_and_restrictions(spark, tmp_path):
    """An ACCURATE single-clause filter (agency equality) pushes into
    the stream's portal WHERE — only matching rows ever ingest; the
    inaccurate/multi-clause families raise instead of silently
    breaking the linear offset."""
    server = FakePortal("socrata")
    loader = _loader(spark, server, page_size=500)
    seen: dict = {}
    s = loader.load_stream(agency="Springfield PD")
    _drain_into(s.select("case_id", "agency"),
                str(tmp_path / "ck"), seen)
    got = [r for batch in seen.values() for r in batch]
    expected = [r["case_id"] for r in server.rows
                if r["agency"] == "Springfield PD"]
    assert sorted(r[0] for r in got) == sorted(expected)
    assert all(r[1] == "Springfield PD" for r in got)
    assert len(got) > 0

    # the month-name LIKE family is an INACCURATE multi-clause
    # pushdown -> load_stream must refuse rather than corrupt the
    # stream's linear offset
    from openpolicedata_spark.sources.portals.where import DateFormat

    txt = _loader(spark, server,
                  date_format=DateFormat.MONTH_ABBREV_TEXT.value)
    with pytest.raises(ValueError, match="ACCURATE|one WHERE"):
        txt.load_stream(date=2020)


def test_source_load_stream_routes_and_refuses_files(spark):
    """Source.load_stream (round 13): a portal-backed catalog row
    resolves exactly like load() and returns the loader's streaming
    DataFrame; a file-backed row refuses with the file-stream hint
    (Spark's own file source is the right tool there)."""
    from openpolicedata_spark.catalog import Catalog
    from openpolicedata_spark.data import Source

    cat = Catalog([
        dict(State="Ohio", SourceName="Columbus", Agency="Columbus",
             TableType="STOPS", Year="MULTI", DataType="Socrata",
             URL="fake.portal", dataset_id="abcd-1234",
             date_field="incident_date", agency_field="agency"),
        dict(State="Ohio", SourceName="Columbus", Agency="Columbus",
             TableType="ARRESTS", Year=2020, DataType="CSV",
             URL="http://x/a.csv"),
    ])
    src = Source("Columbus", catalog=cat, spark=spark)
    server = FakePortal("socrata", rows=make_rows(40))
    fake_loader = _loader(spark, server, page_size=25)
    src._get_loader = lambda row: (
        fake_loader if row["DataType"] == "Socrata"
        else Source._get_loader(src, row))
    s = src.load_stream("STOPS")
    assert s.isStreaming
    seen: dict = {}
    import tempfile

    _drain_into(s.select("case_id"), tempfile.mkdtemp(), seen)
    assert sum(len(v) for v in seen.values()) == 25  # first page

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="file-backed"):
        src.load_stream("ARRESTS", 2020)
