"""Standardization pipeline tests on a seeded synthetic STOPS table
(reference test model: tests/test_preproc.py:39-366)."""

import random

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.defs import Columns
from openpolicedata_spark.standardize import ColumnIdentifier, standardize


@pytest.fixture(scope="module")
def stops_df(spark):
    rng = random.Random(42)
    races = ["WHITE", "BLACK", "HISPANIC", "ASIAN", "UNKNOWN", "W", "B"]
    genders = ["M", "F", "MALE", "FEMALE", "U"]
    rows = []
    for i in range(1000):
        rows.append((
            i,
            f"2021-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}",
            f"{rng.randint(0,23):02d}:{rng.randint(0,59):02d}",
            rng.choice(races),
            rng.choice(races),
            rng.choice(genders),
            rng.randint(15, 80) if rng.random() > 0.05 else 999,
            rng.choice(["Y", "N"]),
            f"{rng.randint(10000, 99999)}",
        ))
    return spark.createDataFrame(
        rows,
        "incident_id int, incident_date string, stop_time string, "
        "subject_race string, officer_race string, sex string, "
        "subject_age int, injury string, zip_code string",
    )


class TestColumnIdentification:
    def test_finds_date_and_time(self, stops_df):
        ident = ColumnIdentifier(stops_df, "STOPS")
        assert ident.find_matches(["date"], validator=ident.validate_date) == ["incident_date"]
        assert ident.find_matches(["time"], validator=ident.validate_time) == ["stop_time"]

    def test_role_attribution(self, stops_df):
        ident = ColumnIdentifier(stops_df, "STOPS")
        roles = ident.attribute_roles(["subject_race", "officer_race", "race"])
        assert roles["subject_race"] == "SUBJECT"
        assert roles["officer_race"] == "OFFICER"
        assert roles["race"] is None

    def test_table_type_default_role(self, stops_df):
        ident = ColumnIdentifier(stops_df, "USE OF FORCE - OFFICERS")
        assert ident.attribute_roles(["race"])["race"] == "OFFICER"

    def test_validators_reject_wrong_data(self, stops_df):
        ident = ColumnIdentifier(stops_df, "STOPS")
        s = ident.sample
        assert not ident.validate_race(s["incident_date"])
        assert not ident.validate_time(s["incident_date"])
        assert ident.validate_zip(s["zip_code"])
        assert not ident.validate_zip(s["stop_time"])


class TestStandardize:
    def test_full_pipeline(self, stops_df):
        out, transforms = standardize(stops_df, table_type="STOPS")
        cols = out.columns
        assert Columns.DATE in cols
        assert Columns.TIME in cols
        assert Columns.DATETIME in cols
        assert Columns.RACE_SUBJECT in cols
        assert Columns.RACE_OFFICER in cols
        assert Columns.GENDER_OFF_SUB in cols  # 'sex' has no role marker
        assert Columns.AGE_SUBJECT in cols
        assert Columns.ZIP_CODE in cols
        # raw columns renamed RAW_*
        assert "RAW_subject_race" in cols and "subject_race" not in cols

    def test_values_standardized(self, stops_df):
        out, _ = standardize(stops_df, table_type="STOPS")
        races = {r.v for r in out.select(
            F.col(Columns.RACE_SUBJECT).alias("v")).distinct().collect()}
        assert races <= {"WHITE", "BLACK", "LATINO", "ASIAN", "UNKNOWN"}
        ages = out.select(F.min(Columns.AGE_SUBJECT).alias("lo"),
                          F.max(Columns.AGE_SUBJECT).alias("hi")).first()
        assert lo_hi_ok(ages.lo, ages.hi)
        # 999 error codes nulled
        n_null = out.where(F.col(Columns.AGE_SUBJECT).isNull()).count()
        assert n_null > 0

    def test_datetime_merge(self, stops_df):
        out, _ = standardize(stops_df, table_type="STOPS")
        row = out.select(Columns.DATE, Columns.TIME, Columns.DATETIME).first()
        assert row[Columns.DATETIME].hour * 3600 + row[Columns.DATETIME].minute * 60 \
            == row[Columns.TIME]

    def test_known_cols_override(self, stops_df):
        out, _ = standardize(
            stops_df, table_type="STOPS",
            known_cols={Columns.DATE: "incident_date"},
        )
        assert Columns.DATE in out.columns

    def test_known_cols_missing_raises(self, stops_df):
        with pytest.raises(ValueError, match="not in DataFrame"):
            standardize(stops_df, known_cols={Columns.DATE: "nope"})

    def test_keep_raw_false_drops(self, stops_df):
        out, _ = standardize(stops_df, table_type="STOPS", keep_raw=False)
        assert "subject_race" not in out.columns
        assert "RAW_subject_race" not in out.columns

    def test_no_id_null(self, stops_df):
        out, _ = standardize(stops_df, table_type="STOPS", no_id="null")
        races = {r.v for r in out.select(
            F.col(Columns.RACE_SUBJECT).alias("v")).distinct().collect()}
        assert None not in races  # all sample values are known codes

    def test_calls_for_service_skipped(self, stops_df):
        out, transforms = standardize(stops_df, table_type="CALLS FOR SERVICE")
        assert transforms == [] and out is stops_df

    def test_transform_log(self, stops_df):
        _, transforms = standardize(stops_df, table_type="STOPS")
        by_new = {t.new_column_name: t for t in transforms}
        assert by_new[Columns.RACE_SUBJECT].orig_column_name == "subject_race"
        assert "strategy" in by_new[Columns.DATE].data_maps

    def test_standardize_is_lazy(self, stops_df):
        """Standardization must not launch jobs beyond the one sample read."""
        out, _ = standardize(stops_df, table_type="STOPS")
        # plan exists; executing it works
        assert out.count() == 1000


def lo_hi_ok(lo, hi):
    return lo >= 1 and hi <= 120


# -- multi-person cells (SURVEY §2.8; reference preproc.py:1623-1944) --------

def _std(spark, rows, schema, **kw):
    from openpolicedata_spark.standardize import standardize

    return standardize(spark.createDataFrame(rows, schema), **kw)


def test_multi_person_delimited_to_arrays_and_expand(spark):
    rows = [
        ("C1", "WHITE, BLACK", "M, F", "25, 31"),
        ("C2", "ASIAN", "F", "40"),
        ("C3", None, None, None),
    ]
    out, tf = _std(spark, rows, "case string, subject_race string, "
                                "subject_sex string, subject_age string")
    from pyspark.sql import types as T

    assert isinstance(out.schema["SUBJECT_RACE"].dataType, T.ArrayType)
    got = {r.case: r for r in out.collect()}
    assert got["C1"].SUBJECT_RACE == ["WHITE", "BLACK"]
    assert got["C1"].SUBJECT_GENDER == ["MALE", "FEMALE"]
    assert got["C1"].SUBJECT_AGE == [25, 31]
    assert got["C2"].SUBJECT_RACE == ["ASIAN"]
    multi_marked = [t for t in tf if t.data_maps and "multi" in t.data_maps]
    assert len(multi_marked) == 3

    from openpolicedata_spark.operators.expand import expand

    ex = expand(out, ["SUBJECT_RACE", "SUBJECT_GENDER", "SUBJECT_AGE"])
    per_case = {}
    for r in ex.collect():
        per_case.setdefault(r.case, []).append(
            (r.PERSON_INDEX, r.SUBJECT_RACE, r.SUBJECT_GENDER, r.SUBJECT_AGE))
    assert sorted(per_case["C1"]) == [(0, "WHITE", "MALE", 25),
                                      (1, "BLACK", "FEMALE", 31)]
    assert per_case["C2"] == [(0, "ASIAN", "F".replace("F", "FEMALE"), 40)]


def test_multi_person_counts_syntax(spark):
    from openpolicedata_spark.standardize.multi import (
        MultData, MultType, detect_multi, multi_expr)
    import pandas as pd
    from pyspark.sql import functions as F

    s = pd.Series(["2 - White, 1 - Black", "1 - Asian", None])
    m = detect_multi(s)
    assert m.type == MultType.COUNTS and m.delim == ","
    df = spark.createDataFrame([("2 - WHITE, 1 - BLACK",), ("1 - ASIAN",)], "v string")
    out = df.select(multi_expr(F.col("v"), m, lambda c: c).alias("a")).collect()
    assert out[0].a == ["WHITE", "WHITE", "BLACK"]
    assert out[1].a == ["ASIAN"]


def test_multi_person_multiplier_syntax(spark):
    from openpolicedata_spark.standardize.multi import (
        MultType, detect_multi, multi_expr)
    import pandas as pd
    from pyspark.sql import functions as F

    s = pd.Series(["Mx3 / F", "M / F", "Fx2"])
    m = detect_multi(s)
    assert m.type == MultType.MULTIPLIER and m.delim == "/"
    df = spark.createDataFrame([("Mx3 / F",), ("F",)], "v string")
    out = df.select(multi_expr(F.col("v"), m, lambda c: c).alias("a")).collect()
    assert out[0].a == ["M", "M", "M", "F"]
    assert out[1].a == ["F"]


def test_multi_person_agreement_veto(spark):
    """A delimiter that appears in only one column with disagreeing person
    counts must NOT trigger array conversion (reference cross-column
    agreement, preproc.py:1861-1923)."""
    import pandas as pd
    from openpolicedata_spark.standardize.multi import agreement

    sample = pd.DataFrame({
        "subject_race": ["WHITE, BLACK", "ASIAN, WHITE, BLACK"],
        "subject_sex": ["M, F, F", "M"],
    })
    assert not agreement(sample, {"subject_race": ",", "subject_sex": ","})


# -- extras: names, swap repair, one-hot fold, code lookup -------------------

def test_name_column_standardized(spark):
    rows = [("C1", "SMITH, JOHN", "WHITE"), ("C2", "Jane Doe", "BLACK")]
    out, _ = _std(spark, rows, "case string, officer_name string, subject_race string")
    got = {r.case: r for r in out.collect()}
    assert got["C1"].OFFICER_NAME == "SMITH, JOHN"


def test_gender_race_swap_repair(spark):
    """Publisher put genders in 'race' and races in 'sex' — the swap must be
    detected and repaired (reference preproc.py:972-993)."""
    rows = [("M", "WHITE"), ("F", "BLACK"), ("M", "ASIAN"), ("F", "WHITE")] * 5
    out, _ = _std(spark, rows, "race string, sex string")
    r0 = out.collect()
    races = {r["OFFICER/SUBJECT_RACE"] for r in r0}
    genders = {r["OFFICER/SUBJECT_GENDER"] for r in r0}
    assert races == {"WHITE", "BLACK", "ASIAN"}
    assert genders == {"MALE", "FEMALE"}


def test_onehot_race_fold(spark):
    """Bloomington-style per-race boolean columns fold into one categorical
    (reference _converters.py:37-124)."""
    rows = [("C1", "true", "false", "false"),
            ("C2", "false", "true", "false"),
            ("C3", "true", "true", "false"),
            ("C4", "false", "false", "false")]
    out, _ = _std(spark, rows,
                  "case string, white string, black string, hispanic string")
    got = {r.case: r["OFFICER/SUBJECT_RACE"] for r in out.collect()}

    def scalar_or_arr(v):
        return v if not isinstance(v, list) else v
    # multi-true rows go through the multi-person parser → arrays
    assert got["C1"] in ("WHITE", ["WHITE"])
    assert got["C2"] in ("BLACK", ["BLACK"])
    assert got["C3"] in ("WHITE, BLACK", ["WHITE", "BLACK"])
    assert got["C4"] is None
    # the consumed boolean columns must not re-identify as other demographics
    assert "OFFICER/SUBJECT_ETHNICITY" not in out.columns


def test_agency_code_lookup_broadcast(spark):
    from openpolicedata_spark.standardize.extras import apply_code_lookup
    from openpolicedata_spark.plans import summarize_plan

    df = spark.createDataFrame([("CA0010000", 1), ("CA0020000", 2), ("XX", 3)],
                               "ori string, n int")
    lookup = spark.createDataFrame(
        [("CA0010000", "Alameda County Sheriff"), ("CA0020000", "Berkeley PD")],
        "code string, value string")
    out = apply_code_lookup(df, lookup, "ori", "AGENCY")
    got = {r.n: r.AGENCY for r in out.collect()}
    assert got == {1: "Alameda County Sheriff", 2: "Berkeley PD", 3: None}
    assert summarize_plan(out).n_broadcast_joins >= 1
    assert summarize_plan(out).n_sortmerge_joins == 0


def test_date_precision_period_semantics(spark):
    """Year-only date columns floor to Jan-1 and carry DATE_PRECISION;
    period-overlap filtering matches the reference's Period semantics."""
    from pyspark.sql import functions as F

    from openpolicedata_spark.functions.datetime import period_overlap_filter

    rows = [("C1", "2019"), ("C2", "2020"), ("C3", "2021")]
    out, _ = _std(spark, rows, "case string, incident_date string")
    assert "DATE_PRECISION" in out.columns
    got = {r.case: (r.DATE, r.DATE_PRECISION) for r in out.collect()}
    assert got["C2"][0].year == 2020 and got["C2"][1] == "year"
    # a mid-2020 range must still match the year-2020 period
    hit = out.where(period_overlap_filter(
        F.col("DATE"), F.col("DATE_PRECISION"), "2020-06-01", "2020-07-01"))
    assert [r.case for r in hit.collect()] == ["C2"]


def test_role_and_firearm_standardized(spark):
    rows = [("C1", "Officer", "Y"), ("C2", "Civilian", "NO"),
            ("C3", "unknown", "FIREARM DISCHARGED")]
    out, _ = _std(spark, rows,
                  "case string, person_type string, firearm_used string")
    got = {r.case: r for r in out.collect()}
    assert got["C1"].SUBJECT_OR_OFFICER == "OFFICER"
    assert got["C2"].SUBJECT_OR_OFFICER == "SUBJECT"
    fire = {r.case: r["OFFICER/SUBJECT_FIREARM_USED"] for r in out.collect()}
    assert fire == {"C1": "YES", "C2": "NO", "C3": "YES"}


class TestTableAccessors:
    """Table.get_race_col/get_gender_col/get_age_col/get_transform_map
    (reference data.py:215-310, 548-576)."""

    @pytest.fixture(scope="class")
    def std_table(self, stops_df):
        from openpolicedata_spark.data import Table

        t = Table(stops_df, table_type="STOPS", source_name="Test",
                  state="TS")
        return t.standardize()

    def test_role_column_lookup(self, std_table):
        # RE_GROUP (race/ethnicity group) outranks plain RACE, as in the
        # reference's priority chain
        assert std_table.get_race_col("SUBJECT") == Columns.RE_GROUP_SUBJECT
        assert std_table.get_race_col("OFFICER") == Columns.RE_GROUP_OFFICER
        # 'sex' had no role marker → combined column serves both roles
        assert std_table.get_gender_col("SUBJECT") == Columns.GENDER_OFF_SUB
        assert std_table.get_gender_col("OFFICER") == Columns.GENDER_OFF_SUB
        assert std_table.get_age_col("SUBJECT") == Columns.AGE_SUBJECT
        assert std_table.get_age_col("OFFICER") is None

    def test_role_lookup_unstandardized_is_none(self, stops_df):
        from openpolicedata_spark.data import Table

        t = Table(stops_df, table_type="STOPS")
        assert t.get_race_col() is None and t.get_age_col() is None

    def test_transform_map(self, std_table):
        all_maps = std_table.get_transform_map()
        assert any(m.new_column_name == Columns.RACE_SUBJECT for m in all_maps)
        one = std_table.get_transform_map(new=Columns.RACE_SUBJECT)
        assert one is not None and one.orig_column_name == "subject_race"
        assert std_table.get_transform_map(new="NOPE") is None
        # minimize drops value counts but not the mapping itself
        slim = std_table.get_transform_map(minimize=True)
        assert all(m.orig_value_counts is None for m in slim)
        # the original audit list is untouched (deep copy)
        assert std_table.get_transform_map(new=Columns.RACE_SUBJECT) is not None


def test_numbered_columns_merged_to_array(spark):
    """race1..race3 (one table of people merged sideways) → ONE positional
    array column (reference preproc.py:1266-1317): trailing empties
    trimmed, interior nulls kept as '' so persons stay aligned."""
    rows = [
        ("C1", "WHITE", "BLACK", None),     # trailing null trimmed
        ("C2", "BLACK", None, "ASIAN"),     # interior null → '' placeholder
        ("C3", None, None, None),           # all empty → empty array
        ("C4", "HISPANIC", "WHITE", "BLACK"),
        ("C5", "ASIAN", "WHITE", "WHITE"),
        ("C6", "WHITE", None, None),
    ]
    out, transforms = _std(
        spark, rows,
        "case string, subject_race1 string, subject_race2 string, "
        "subject_race3 string",
        table_type="USE OF FORCE")
    assert "SUBJECT_RACE" in out.columns
    got = {r.case: r.SUBJECT_RACE for r in out.collect()}
    assert got["C1"] == ["WHITE", "BLACK"]
    assert got["C2"][0] == "BLACK" and got["C2"][2] == "ASIAN"
    assert len(got["C2"]) == 3
    assert got["C3"] == []
    assert got["C4"] == ["LATINO", "WHITE", "BLACK"]
    assert got["C6"] == ["WHITE"]
    # sources consumed: renamed RAW_*, merged column recorded in the audit
    assert "subject_race1" not in out.columns
    assert "RAW_subject_race1" in out.columns
    assert any(m.data_maps and "numbered_merge" in m.data_maps
               for m in transforms)


def test_numbered_merge_requires_full_sequence(spark):
    """race1 + race3 (gap) must NOT merge — they are independent columns
    and the reference's set(nums)==range check rejects them."""
    rows = [("C1", "WHITE", "BLACK")]
    out, _ = _std(spark, rows, "case string, race1 string, race3 string",
                  table_type="USE OF FORCE")
    # no merged array column was synthesized
    assert not any(isinstance(f.dataType, type(out.schema["case"].dataType))
                   is False and f.name.endswith("_merged")
                   for f in out.schema.fields)
    assert not any(f.name.endswith("_merged") for f in out.schema.fields)


def test_custom_category_dicts(spark):
    """race_cats/gender_cats relabel canonical outputs; invalid keys raise
    (reference data.py:682-757 + BadCategoryDict)."""
    rows = [("C1", "WHITE", "M"), ("C2", "BLACK", "F")]
    schema = "case string, subject_race string, subject_sex string"
    out, _ = _std(spark, rows, schema,
                  race_cats={"WHITE": "Caucasian"},
                  gender_cats={"MALE": "Man", "FEMALE": "Woman"})
    got = {r.case: (r.SUBJECT_RACE, r.SUBJECT_GENDER) for r in out.collect()}
    assert got["C1"] == ("Caucasian", "Man")
    assert got["C2"] == ("BLACK", "Woman")  # unmapped categories unchanged
    with pytest.raises(ValueError, match="Invalid race category"):
        _std(spark, rows, schema, race_cats={"NOT_A_CATEGORY": "X"})


def test_agg_race_cat(spark):
    """agg_race_cat=True applies the census-based aggregation (e.g. East
    African → BLACK); False leaves the value unmapped (no_id=keep)."""
    rows = [("C1", "EAST AFRICAN"), ("C2", "WHITE"), ("C3", "BLACK"),
            ("C4", "WHITE")]
    schema = "case string, subject_race string"
    out_plain, _ = _std(spark, rows, schema)
    out_agg, _ = _std(spark, rows, schema, agg_race_cat=True)
    plain = {r.case: r.SUBJECT_RACE for r in out_plain.collect()}
    agg = {r.case: r.SUBJECT_RACE for r in out_agg.collect()}
    assert plain["C1"] == "EAST AFRICAN"
    assert agg["C1"] == "BLACK"
    assert plain["C2"] == agg["C2"] == "WHITE"


def test_empty_time_ignore(spark):
    """empty_time='ignore': DATETIME falls back to the bare date for null
    times instead of null (reference datetime_parser.py:206-228)."""
    rows = [("C1", "2021-03-04", "12:30"), ("C2", "2021-03-05", None)]
    schema = "case string, incident_date string, stop_time string"
    out_nat, _ = _std(spark, rows, schema)
    out_ign, _ = _std(spark, rows, schema, empty_time="ignore")
    nat = {r.case: r.DATETIME for r in out_nat.collect()}
    ign = {r.case: r.DATETIME for r in out_ign.collect()}
    assert nat["C2"] is None
    assert ign["C2"] is not None and ign["C2"].day == 5
    assert nat["C1"] == ign["C1"]


def test_marsy_exempt_cells_do_not_vote(spark):
    """Marsy's-law boilerplate contains commas; it must not trigger
    multi-person detection (reference preproc.py:284-288, 1812-1816)."""
    import pandas as pd

    from openpolicedata_spark.standardize.multi import MultType, detect_multi

    vals = pd.Series(
        ["WHITE", "BLACK", "ASIAN"] * 5
        + ["Exempt per Marsy's Law, FL Const., Art. I, s. 16"] * 5)
    assert detect_multi(vals).type == MultType.SINGLE
    # but genuine delimiters still win
    vals2 = pd.Series(["WHITE, BLACK"] * 5 + ["ASIAN"] * 5)
    assert detect_multi(vals2).type == MultType.DELIMITED


def test_numbered_merge_with_ethnicity_combo(spark):
    """Array-valued race (numbered merge) + scalar ethnicity must combine
    element-wise, not crash with a string/array type mismatch."""
    rows = [
        ("C1", "WHITE", "BLACK", "HISPANIC"),
        ("C2", "BLACK", "WHITE", "NOT HISPANIC"),
        ("C3", "ASIAN", None, "NOT HISPANIC"),
        ("C4", "WHITE", "BLACK", "HISPANIC"),
    ]
    out, _ = _std(
        spark, rows,
        "case string, subject_race1 string, subject_race2 string, "
        "subject_ethnicity string",
        table_type="USE OF FORCE")
    assert Columns.RE_GROUP_SUBJECT in out.columns
    got = {r.case: r[Columns.RE_GROUP_SUBJECT] for r in out.collect()}
    # Latino ethnicity overrides every person's race in the combo
    assert got["C1"] == ["LATINO", "LATINO"]
    assert got["C2"] == ["BLACK", "WHITE"]


def test_collect_value_counts_with_numbered_merge(spark):
    """collect_value_counts must skip the synthetic numbered-merge audit
    record (its orig_column_name is a str(list), not a real column)."""
    rows = [("C1", "WHITE", "BLACK"), ("C2", "BLACK", None),
            ("C3", "WHITE", "WHITE")]
    out, transforms = _std(
        spark, rows, "case string, subject_race1 string, subject_race2 string",
        table_type="USE OF FORCE", collect_value_counts=True)
    assert out.count() == 3
    merged = [t for t in transforms
              if t.data_maps and "numbered_merge" in t.data_maps]
    assert merged and merged[0].orig_value_counts is None


def test_numbered_merge_concat_combo_keeps_ethnicity(spark):
    """race_eth_combo='concat' with array race + scalar ethnicity must
    concat per person, not silently drop the ethnicity."""
    rows = [("C1", "WHITE", "BLACK", "HISPANIC"),
            ("C2", "BLACK", "WHITE", "NOT HISPANIC"),
            ("C3", "WHITE", None, "NOT HISPANIC"),
            ("C4", "ASIAN", "WHITE", "HISPANIC")]
    out, _ = _std(
        spark, rows,
        "case string, subject_race1 string, subject_race2 string, "
        "subject_ethnicity string",
        table_type="USE OF FORCE", race_eth_combo="concat")
    got = {r.case: r[Columns.RE_GROUP_SUBJECT] for r in out.collect()}
    assert got["C1"] == ["WHITE LATINO", "BLACK LATINO"]
    assert got["C2"] == ["BLACK NON-LATINO", "WHITE NON-LATINO"]


def test_defs_category_getters_feed_standardize(spark):
    """Reference defs.py getters (get_race_cats/get_eth_cats/
    get_gender_cats/get_*_keys/get_roles) exist with the reference's
    label tables, and their dicts flow into standardize's relabeling."""
    from openpolicedata_spark import defs
    from openpolicedata_spark.standardize import standardize

    assert len(defs.get_race_cats()) == 11
    assert len(defs.get_race_cats(expand=True)) == 15
    assert defs.get_race_cats()["WHITE"] == "WHITE"
    assert defs.get_race_cats(compact=True)["WHITE"] == "W"
    assert defs.get_eth_cats()["NON-LATINO"] == "NON-HISPANIC/NON-LATINO"
    assert defs.get_gender_cats(compact=True)["FEMALE"] == "F"
    assert defs.get_race_keys().AAPI == "AAPI"
    assert defs.get_roles().OFFICER == "OFFICER"
    # keys objects are mutation-safe copies
    k = defs.get_race_keys()
    k.WHITE = "tampered"
    assert defs.get_race_keys().WHITE == "WHITE"

    df = spark.createDataFrame(
        [(1, "W"), (2, "BLACK"), (3, "H")], "id long, subject_race string")
    out, _ = standardize(df, table_type="STOPS",
                         race_cats=defs.get_race_cats(compact=True))
    got = {r.id: r.SUBJECT_RACE for r in out.select("id", "SUBJECT_RACE").collect()}
    assert got == {1: "W", 2: "B", 3: "H"}


def test_multi_with_name_mode(spark):
    """'Name CC/C' cells (reference std_with_names): extract embedded
    race/gender code pairs; item_num picks the side."""
    from openpolicedata_spark.functions import luts
    from openpolicedata_spark.standardize.multi import (
        MultData,
        MultType,
        detect_multi,
        multi_expr,
    )
    import pandas as pd

    vals = ["Doe, John W/M Smith, Jane B/F", "Brown, Ann A/F"]
    assert detect_multi(pd.Series(vals)).type == MultType.WITH_NAME

    df = spark.createDataFrame([(1, vals[0]), (2, vals[1])], "id long, raw string")
    races = multi_expr(F.col("raw"), MultData(MultType.WITH_NAME),
                       lambda c: luts.race_expr(c), item_num=0)
    genders = multi_expr(F.col("raw"), MultData(MultType.WITH_NAME),
                         lambda c: luts.gender_expr(c), item_num=1)
    got = {r.id: (r.r, r.g) for r in
           df.select("id", races.alias("r"), genders.alias("g")).collect()}
    assert got[1] == (["WHITE", "BLACK"], ["MALE", "FEMALE"])
    assert got[2] == (["ASIAN"], ["FEMALE"])


def test_multi_demo_col_mode(spark):
    """'(White, Male) (Black, Female)' cells (reference std_demo_col)."""
    from openpolicedata_spark.functions import luts
    from openpolicedata_spark.standardize.multi import (
        MultData,
        MultType,
        detect_multi,
        multi_expr,
    )
    import pandas as pd

    vals = ["(White, Male) (Black, Female)", "(Asian / Female)"]
    assert detect_multi(pd.Series(vals)).type == MultType.DEMO_COL

    df = spark.createDataFrame([(1, vals[0]), (2, vals[1])], "id long, raw string")
    races = multi_expr(F.col("raw"), MultData(MultType.DEMO_COL),
                       lambda c: luts.race_expr(c), item_num=0)
    genders = multi_expr(F.col("raw"), MultData(MultType.DEMO_COL),
                         lambda c: luts.gender_expr(c), item_num=1)
    got = {r.id: (r.r, r.g) for r in
           df.select("id", races.alias("r"), genders.alias("g")).collect()}
    assert got[1] == (["WHITE", "BLACK"], ["MALE", "FEMALE"])
    assert got[2] == (["ASIAN"], ["FEMALE"])


def test_multi_with_counts_mode(spark):
    """'2 Injured 1 Deceased' / 'Deceased Injured' cells (reference
    std_with_counts): vocabulary-driven phrase extraction with optional
    leading counts."""
    from openpolicedata_spark.functions import luts
    from openpolicedata_spark.standardize.multi import (
        MultData,
        MultType,
        detect_multi,
        multi_expr,
    )
    import pandas as pd

    vals = ["2 Injured 1 Deceased", "Deceased Injured", "3 Injured"]
    assert detect_multi(pd.Series(vals)).type == MultType.WITH_COUNTS

    df = spark.createDataFrame(list(enumerate(vals)), "id long, raw string")
    arr = multi_expr(F.col("raw"), MultData(MultType.WITH_COUNTS),
                     lambda c: luts.injury_expr(c),
                     vocab=["Injured", "Deceased"])
    got = {r.id: r.a for r in df.select("id", arr.alias("a")).collect()}
    assert got[0] == ["INJURED", "INJURED", "FATAL"]
    assert got[1] == ["FATAL", "INJURED"]
    assert got[2] == ["INJURED", "INJURED", "INJURED"]


def test_dict_expr_maptype_cells(spark):
    """MapType {person_idx: raw} cells standardize in place (reference
    std_dict)."""
    from openpolicedata_spark.functions import luts
    from openpolicedata_spark.standardize.multi import dict_expr

    df = spark.createDataFrame(
        [(1, {0: "W", 1: "BLACK"}), (2, {0: "H"})],
        "id long, raw map<int,string>")
    out = df.select("id", dict_expr(F.col("raw"),
                                    lambda c: luts.race_expr(c)).alias("m"))
    got = {r.id: dict(r.m) for r in out.collect()}
    assert got[1] == {0: "WHITE", 1: "BLACK"}
    assert got[2] == {0: "LATINO"}


def test_standardize_plumbs_item_num_and_counts_vocab(spark):
    """Production-path regression for the review findings: a DEMO_COL
    gender column must read field 1 (not the race field), an injury
    column with '2 Injured 1 Deceased' cells must standardize via the
    counts vocabulary instead of crashing, and a race column with
    digit-word cells (no vocabulary available) must NOT elect
    WITH_COUNTS."""
    from openpolicedata_spark.standardize import standardize

    df = spark.createDataFrame(
        [(1, "(White, Male) (Black, Female)", "2 Injured 1 Deceased"),
         (2, "(Asian / Female)", "Uninjured")],
        "id long, subject_demographics_race string, subject_injury string")
    out, info = standardize(df, table_type="USE OF FORCE")
    rows = {r.id: r.asDict() for r in out.collect()}
    assert rows[1]["SUBJECT_RACE"] == ["WHITE", "BLACK"]
    assert rows[1]["SUBJECT_INJURY"] == ["INJURED", "INJURED", "FATAL"]
    # word boundary: 'Uninjured' must not match the 'Injured' phrase
    assert rows[2]["SUBJECT_INJURY"] == []

    # gender family reads side 1 of the same demo-col encoding
    df2 = spark.createDataFrame(
        [(1, "(White, Male) (Black, Female)")],
        "id long, subject_gender string")
    out2, _ = standardize(df2, table_type="USE OF FORCE")
    assert out2.collect()[0]["SUBJECT_GENDER"] == ["MALE", "FEMALE"]

    # race cells like '2 White 1 Black' (digit-words, no vocab for the
    # race family): must not crash; delimiter election proceeds instead
    df3 = spark.createDataFrame(
        [(1, "2 White 1 Black"), (2, "White")],
        "id long, subject_race string")
    out3, _ = standardize(df3, table_type="USE OF FORCE")
    assert "SUBJECT_RACE" in out3.columns  # reached apply without error


def test_standardize_maptype_dict_cells(spark):
    """A MapType {person_idx: raw} race column (the form merge round
    trips produce — reference std_dict) must be identified, validated on
    its dict VALUES, and standardized in place via transform_values."""
    from openpolicedata_spark.standardize import standardize

    df = spark.createDataFrame(
        [(1, {0: "W", 1: "BLACK"}), (2, {0: "H"}), (3, {0: "B"})],
        "id long, subject_race map<int,string>")
    out, info = standardize(df, table_type="STOPS")
    got = {r.id: dict(r.SUBJECT_RACE) for r in
           out.select("id", "SUBJECT_RACE").collect()}
    assert got == {1: {0: "WHITE", 1: "BLACK"}, 2: {0: "LATINO"},
                   3: {0: "BLACK"}}
    assert any((t.data_maps or {}).get("multi") == "dict" for t in info)
