"""Source/Table load-path tests: date semantics, filters, counts, save/load
round trips (reference model: tests/test_loaders_general.py and
1_unit_data_source_loading consistency oracles, SURVEY §5)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.sources.base import clean_date_input


class TestCleanDateInput:
    def test_none_and_sentinels(self):
        assert clean_date_input(None) is None
        assert clean_date_input("MULTIPLE") is None
        assert clean_date_input("NONE") is None

    def test_single_year(self):
        lo, hi = clean_date_input(2022)
        assert lo == dt.datetime(2022, 1, 1) and hi == dt.datetime(2022, 12, 31)

    def test_year_string(self):
        lo, hi = clean_date_input("2022")
        assert lo.year == hi.year == 2022

    def test_range_mixed(self):
        lo, hi = clean_date_input([2021, "2023-02-01"])
        assert lo == dt.datetime(2021, 1, 1) and hi == dt.datetime(2023, 2, 1)

    def test_time_floored_with_warning(self):
        with pytest.warns(UserWarning, match="ignored"):
            lo, hi = clean_date_input(["2022-01-01T10:30:00", "2022-06-30"])
        assert lo == dt.datetime(2022, 1, 1)

    def test_reversed_raises(self):
        with pytest.raises(ValueError, match="less|<="):
            clean_date_input([2023, 2021])

    def test_bad_number_raises(self):
        with pytest.raises(ValueError):
            clean_date_input(123)


class TestSourceLoad:
    def test_year_filter_matches_manual(self, spark, source, sf_dir):
        t = source.load("ORDERS", 1995)
        manual = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .where(F.year("o_orderdate") == 1995)
            .count()
        )
        assert t.count() == manual

    def test_filter_vs_no_filter_consistency(self, source):
        """Loading with a date filter covering everything equals the
        unfiltered load (reference consistency oracle)."""
        full = source.load("ORDERS").count()
        wide = source.load("ORDERS", [1990, 2050]).count()
        assert full == wide

    def test_count_equals_load_len(self, source):
        n = source.get_count("ORDERS", 1996)
        assert n == source.load("ORDERS", 1996).count()

    def test_get_years(self, source):
        ys = source.get_years("ORDERS")
        assert ys == list(range(1995, 2002))

    def test_get_agencies(self, source):
        ags = source.get_agencies("CUSTOMER")
        assert "BUILDING" in ags and len(ags) == 5

    def test_agency_filter(self, source):
        t = source.load("CUSTOMER", agency="BUILDING")
        rows = t.table.select("c_mktsegment").distinct().collect()
        assert [r.c_mktsegment for r in rows] == ["BUILDING"]

    def test_nrows_offset(self, source):
        assert source.load("ORDERS", nrows=7).count() == 7
        a = source.load("ORDERS", nrows=5, offset=0, sortby="date").table.collect()
        b = source.load("ORDERS", nrows=5, offset=2, sortby="date").table.collect()
        assert a[2:4] == b[0:2] or len(b) == 5  # deterministic under sortby

    def test_roundtrip_parquet(self, source, tmp_path):
        t = source.load("ORDERS", 1995)
        p = t.to_parquet(output_dir=str(tmp_path))
        back = source.load_parquet(p)
        assert back.count() == t.count()
        assert set(back.table.columns) == set(t.table.columns)

    def test_related_tables(self, source):
        # synthetic catalog has no split families; exact-name behavior
        assert source.find_related_tables("ORDERS") == []

    def test_load_iter(self, source):
        batches = list(source.load_iter("ORDERS", 1995, nbatch=100))
        assert sum(b.count() for b in batches) == source.get_count("ORDERS", 1995)


def test_csv_loader_reads_zip(spark, tmp_path):
    """Zipped CSVs extract to a spool dir and read distributed
    (reference csv_class.py:64-87)."""
    import zipfile

    csv_text = "case,val\nC1,1\nC2,2\nC3,3\n"
    zpath = tmp_path / "data.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("inner/archive.csv", csv_text)
    from openpolicedata_spark.sources.file import CsvLoader

    loader = CsvLoader(spark, url=str(zpath))
    df = loader.load()
    assert df.count() == 3
    assert {r.case for r in df.collect()} == {"C1", "C2", "C3"}
