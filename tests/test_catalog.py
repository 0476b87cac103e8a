"""Catalog query/dedup/summary invariants (reference test model:
tests/test_datasets.py, SURVEY §5)."""

import pandas as pd
import pytest

from openpolicedata_spark import defs
from openpolicedata_spark.catalog import Catalog, local_testdata_catalog


def make_catalog():
    rows = [
        dict(State="Virginia", SourceName="Richmond", Agency="Richmond",
             TableType="ARRESTS", Year=2021, DataType="CSV", URL="http://x/a.csv"),
        dict(State="Virginia", SourceName="Richmond", Agency="Richmond",
             TableType="ARRESTS", Year=2022, DataType="CSV", URL="http://x/b.csv"),
        dict(State="Ohio", SourceName="Columbus", Agency="Columbus",
             TableType="STOPS", Year="MULTI", DataType="Socrata", URL="http://y"),
        # duplicate row → deduped
        dict(State="Ohio", SourceName="Columbus", Agency="Columbus",
             TableType="STOPS", Year="MULTI", DataType="Socrata", URL="http://y"),
        dict(State="Ohio", SourceName="Columbus", Agency="Columbus",
             TableType="ARRESTS", Year="2020", DataType="ArcGIS",
             URL="http://z/FeatureServer/3/query?x=1"),
    ]
    return Catalog(rows)


def test_dedup_and_normalization():
    cat = make_catalog()
    assert len(cat.df) == 4  # duplicate dropped (datasets.py:78-79)
    years = set(cat.df["Year"])
    assert 2021 in years and defs.MULTI in years
    assert 2020 in years  # digit-string coerced to int
    # ArcGIS URL truncated at layer number (datasets.py:68-76)
    arc = cat.df[cat.df["DataType"] == "ArcGIS"].iloc[0]
    assert arc["URL"] == "http://z/FeatureServer/3"


def test_query_filters():
    cat = make_catalog()
    assert len(cat.query(state="Virginia")) == 2
    assert len(cat.query(source_name="Columbus", table_type="STOPS")) == 1
    assert len(cat.query(state="Texas")) == 0


def test_fuzzy_suggestion():
    cat = make_catalog()
    with pytest.raises(ValueError, match="Did you mean"):
        cat.query(source_name="Richmnd")


def test_summaries():
    cat = make_catalog()
    assert cat.num_unique() == 4
    assert cat.num_sources() == 2
    by_type = cat.summary_by_table_type()
    assert dict(zip(by_type["TableType"], by_type["count"])) == {
        "ARRESTS": 3, "STOPS": 1,
    }


def test_local_testdata_catalog():
    cat = local_testdata_catalog("/root/testdata/sf0.001")
    assert len(cat.df) == 10
    row = cat.query(table_type="ORDERS").iloc[0]
    assert row["date_field"] == "o_orderdate"


def test_get_table_types_and_year_pivot():
    cat = make_catalog()
    assert cat.get_table_types() == ["ARRESTS", "STOPS"]
    assert cat.get_table_types(contains="STOP") == ["STOPS"]
    piv = cat.summary_by_table_type(by_year=True)
    assert "TableType" in piv.columns and len(piv) == 2
    # every dataset is accounted for in the year pivot
    year_cols = [c for c in piv.columns if c != "TableType"]
    assert int(piv[year_cols].to_numpy().sum()) == len(cat.df)


def test_from_csv_round_trip(tmp_path):
    cat = make_catalog()
    p = tmp_path / "catalog.csv"
    cat.df.to_csv(p, index=False)
    cat2 = type(cat).from_csv(p)
    assert len(cat2.df) == len(cat.df)
    assert cat2.get_table_types() == cat.get_table_types()
    # Year normalization survives the string round trip
    assert set(cat2.df["Year"]) == set(cat.df["Year"])


def test_check_simple_dataset_filter(spark):
    from openpolicedata_spark import Source, local_testdata_catalog

    src = Source("TestData", catalog=local_testdata_catalog(), spark=spark)
    url_diff, id_diff, rows = src.check_simple_dataset_filter("ORDERS")
    # one catalog row per table here: no extra filter needed
    assert url_diff is False and id_diff is False and len(rows) == 1


def test_exception_hierarchy_parity(spark):
    """Reference-compatible exception classes, dual-inheriting the builtin
    types this package raised before the hierarchy existed."""
    import pytest as _pytest

    from openpolicedata_spark import exceptions as ex
    from openpolicedata_spark.operators.merge import merge_tables

    assert issubclass(ex.BadCategoryDict, ValueError)
    assert issubclass(ex.OPD_MinVersionError, ex.OPD_GeneralError)
    # auto-merge failure raises the parity class (and still a ValueError)
    l = spark.createDataFrame([(1, "a")], "x int, y string")
    r = spark.createDataFrame([(2, "b")], "p int, q string")
    with _pytest.raises(ex.AutoMergeError):
        merge_tables(l, r)
    with _pytest.raises(ValueError):
        merge_tables(l, r)


# --------------------------------------------------------------------------
# module-level default-catalog API (reference datasets.py:94-330)
# --------------------------------------------------------------------------


def test_module_level_catalog_api():
    from openpolicedata_spark import catalog as datasets

    datasets.reload(make_catalog())  # swap in a known catalog
    try:
        assert len(datasets.query()) == 4  # deduped
        assert len(datasets.query(state="Ohio")) == 2
        assert len(datasets.query(source_name="Richmond")) == 2
        # fuzzy: close-but-wrong name still finds the source
        fz = datasets.query(source_name="richmond", fuzzy_source=True)
        assert set(fz["SourceName"]) == {"Richmond"}
        assert datasets.num_unique() == 3  # State/Source/Agency/Type combos
        assert datasets.num_sources() == 2
        assert datasets.num_sources(full_states_only=True) == 0
        assert datasets.get_table_types(contains="stop") == ["STOPS"]
        st = datasets.summary_by_state()
        assert st.loc["Ohio", "Total"] == 2
        by_tab = datasets.summary_by_state(by="table")
        assert by_tab.loc["Virginia", "ARRESTS"] == 1
        with pytest.raises(ValueError):
            datasets.summary_by_state(by="bogus")
    finally:
        datasets.reload()  # restore default testdata catalog
    assert datasets.num_sources() >= 1


def test_module_level_filename_builders():
    import openpolicedata_spark as ops

    assert ops.get_csv_filename(
        "VA", "Police Dept", "Police Dept", "ARRESTS", 2021) == \
        "VA_Police_Dept_ARRESTS_2021.csv"
    # agency differs from source → included; list date → start_stop
    assert ops.get_parquet_filename(
        "VA", "Src", "Agency A", "STOPS", [2020, 2022]) == \
        "VA_Src_Agency_A_STOPS_2020_2022.parquet"
    assert ops.get_feather_filename(
        "VA", "Src", "Src", "STOPS", 2021, geo=True).endswith(".geofeather")


def test_source_filename_methods(spark):
    from openpolicedata_spark import Source

    cat = local_testdata_catalog("/root/testdata/sf0.001")
    src = Source("TestData", catalog=cat, spark=spark)
    csv = src.get_csv_filename(date=1995, table_type="ORDERS")
    pq = src.get_parquet_filename(date=1995, table_type="ORDERS",
                                  output_dir="/tmp/x")
    assert csv.endswith("ORDERS_1995.csv")
    assert pq.startswith("/tmp/x/") and pq.endswith("ORDERS_1995.parquet")


# -- dataset_id normalization (reference dataset_id.py:40-141) ---------------

def test_parse_id_json_and_curly_quotes():
    from openpolicedata_spark.sources.dataset_id import parse_id

    assert parse_id("abcd-1234") == "abcd-1234"
    assert parse_id('{"files": "a.csv"}') == {"files": "a.csv"}
    assert parse_id('{“files”: “a.csv”}') == {"files": "a.csv"}
    assert parse_id('[{"urls": ["u1", "u2"]}]') == [{"urls": ["u1", "u2"]}]


def test_expand_broadcasts_parallel_arrays():
    from openpolicedata_spark.sources.dataset_id import expand

    got = expand({"urls": ["u1", "u2"], "files": "f.xlsx",
                  "sheets": "2020", "on": ["id"]})
    assert got == [
        {"url": "u1", "file": "f.xlsx", "sheets": ["2020"], "on": ["id"]},
        {"url": "u2", "file": "f.xlsx", "sheets": ["2020"], "on": ["id"]},
    ]
    # join declaration: nested lists expand per side
    got = expand([[{"urls": "a"}], [{"urls": "b"}]])
    assert got == [[{"url": "a"}], [{"url": "b"}]]
    # passthrough
    assert expand("plain-id") == "plain-id"
    assert expand(None) is None


def test_is_combined_dataset():
    from openpolicedata_spark.sources.dataset_id import (
        expand,
        is_combined_dataset,
    )

    assert is_combined_dataset(expand({"urls": ["u1", "u2"]}))
    assert is_combined_dataset(expand([[{"urls": "a"}], [{"urls": "b"}]]))
    assert not is_combined_dataset(expand({"files": "one.xlsx"}))
    assert not is_combined_dataset("plain")


def test_parse_excel_dataset():
    from openpolicedata_spark.sources.dataset_id import parse_excel_dataset

    assert parse_excel_dataset(False, "Sheet1") == (["Sheet1"], None)
    assert parse_excel_dataset(True, "inner.xlsx") == (None, "inner.xlsx")
    # quoted sheet names keep leading zeros
    assert parse_excel_dataset(False, '"0123"') == (["0123"], None)
    assert parse_excel_dataset(False, {"sheets": ["a", "b"], "file": "f.xlsx"}) \
        == (["a", "b"], "f.xlsx")
