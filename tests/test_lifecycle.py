"""End-to-end lifecycle test (reference SURVEY §3.3): load two related
tables → standardize → merge on the auto-detected incident key → expand
multi-person rows → save parquet → reload — one lazy plan per action."""

from __future__ import annotations

import pandas as pd
import pytest


def test_full_lifecycle(spark, tmp_path):
    incidents = spark.createDataFrame(
        [("INC1", "2022-03-01", "UOF at park"),
         ("INC2", "2022-07-15", "UOF downtown"),
         ("INC3", "2023-01-05", "UOF highway")],
        "incident_number string, occurred_date string, narrative string")
    subjects = spark.createDataFrame(
        [("INC1", "WHITE, BLACK", "M, F", "25, 31"),
         ("INC2", "ASIAN", "F", "40"),
         ("INC3", "HISPANIC", "M", "52")],
        "incident_number string, subject_race string, subject_sex string, "
        "subject_age string")

    from openpolicedata_spark.data import Table

    t_inc = Table(incidents, table_type="USE OF FORCE - INCIDENTS",
                  source_name="TestCity")
    t_sub = Table(subjects, table_type="USE OF FORCE - SUBJECTS",
                  source_name="TestCity")
    t_inc.standardize()
    t_sub.standardize()

    # DATE identified + parsed on the incidents side
    assert "DATE" in t_inc.table.columns
    # multi-person arrays on the subjects side
    from pyspark.sql import types as T
    assert isinstance(t_sub.table.schema["SUBJECT_RACE"].dataType, T.ArrayType)

    merged = t_inc.merge(t_sub, std_id=True)       # auto incident-ID key
    expanded = merged.expand(
        ["SUBJECT_RACE", "SUBJECT_GENDER", "SUBJECT_AGE"])
    rows = expanded.table.collect()
    assert len(rows) == 4                          # 2 + 1 + 1 persons
    by_inc = {}
    for r in rows:
        by_inc.setdefault(r.INCIDENT_ID, []).append(
            (r.PERSON_INDEX, r.SUBJECT_RACE, r.SUBJECT_GENDER, r.SUBJECT_AGE))
    assert sorted(by_inc["INC1"]) == [(0, "WHITE", "MALE", 25),
                                      (1, "BLACK", "FEMALE", 31)]
    assert by_inc["INC3"] == [(0, "LATINO", "MALE", 52)]

    # save → reload round trip preserves values and schema
    path = expanded.to_parquet(str(tmp_path / "out.parquet"))
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert set(back.columns) == set(expanded.table.columns)


def test_json_loader(spark, tmp_path):
    p = str(tmp_path / "events.json")
    pd.DataFrame({
        "case": ["C1", "C2", "C3"],
        "d": ["2020-02-02", "2021-03-03", "2020-09-09"],
    }).to_json(p, orient="records", lines=True)
    from openpolicedata_spark.sources.file import JsonLoader

    loader = JsonLoader(spark, url=p, date_field="d")
    assert loader.load().count() == 3
    assert loader.get_count(2020, force=True) == 2


def test_feather_round_trip(spark, tmp_path, source):
    """Table.to_feather → Source.load_feather preserves rows and schema
    (reference data.py:425-444, 1490-1538; driver-side by design)."""
    t = source.load("NATION")
    p = t.to_feather(str(tmp_path / "nation.feather"))
    back = source.load_feather(p, table_type="NATION")
    assert back.count() == t.count()
    assert set(back.table.columns) == set(t.table.columns)
    orig = {r.n_nationkey: r.n_name for r in t.table.collect()}
    got = {r.n_nationkey: r.n_name for r in back.table.collect()}
    assert got == orig


def test_to_feather_guards_driver_oom(spark, tmp_path, source):
    """to_feather materializes on the driver; a table above max_rows must
    refuse with a clear error instead of OOMing, and max_rows=None is the
    explicit escape hatch."""
    t = source.load("NATION")
    with pytest.raises(ValueError, match="max_rows"):
        t.to_feather(str(tmp_path / "n.feather"), max_rows=3)
    p = t.to_feather(str(tmp_path / "n.feather"), max_rows=None)
    assert pd.read_feather(p).shape[0] == t.count()


def test_to_csv_stringifies_array_columns(spark, tmp_path):
    """Standardized tables hold array-valued multi-person columns; the CSV
    sink must JSON-stringify them (Spark's CSV writer rejects arrays),
    mirroring the reference's dict coercion (data.py:405-420)."""
    from openpolicedata_spark.data import Table

    df = spark.createDataFrame(
        [("C1", ["WHITE", "BLACK"]), ("C2", ["ASIAN"])],
        "case string, SUBJECT_RACE array<string>")
    t = Table(df, table_type="UOF", source_name="T", state="TS")
    p = t.to_csv(str(tmp_path / "out.csv"))
    back = spark.read.csv(p, header=True)
    got = {r.case: r.SUBJECT_RACE for r in back.collect()}
    assert got["C1"] == '["WHITE","BLACK"]'


def test_to_pandas_guards_driver_oom(spark, source):
    """to_pandas has the same max_rows contract as to_feather: refuse
    above the bound, escape hatch via max_rows=None."""
    t = source.load("NATION")
    with pytest.raises(ValueError, match="max_rows"):
        t.to_pandas(max_rows=3)
    assert len(t.to_pandas(max_rows=None)) == t.count()
    assert len(t.to_pandas()) == t.count()
