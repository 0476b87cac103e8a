"""streaming.stateful_gap_fill — incremental LOCF/interp gap fill via
applyInPandasWithState (round 11, the VERDICT r10 #7 probe resolved as
buildable): closed-bucket emission parity vs the batch operator,
timeout flush completing the tail, interp-mode value equality, late-row
policy, and batch delegation."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _frame(spark, sf_dir):
    from openpolicedata_spark.sources.file import read_parquet_repaired

    e = read_parquet_repaired(spark, f"{sf_dir}/events.parquet")
    return (e.where(F.col("user_id") % 10 == 3)
            .select("user_id", "ts", "value", "event_id"))


def _write_ordered_splits(frame, src, n_files):
    w = Window.orderBy("ts", "event_id")
    ranked = frame.withColumn("__rn__", F.row_number().over(w))
    n = frame.count()
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        (ranked.where((F.col("__rn__") > i * per)
                      & (F.col("__rn__") <= (i + 1) * per))
         .drop("__rn__").coalesce(1).write.parquet(str(src / f"b{i}")))


def _stream(spark, schema_df, src):
    return (spark.readStream.schema(schema_df.schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/*/"))


def _rows(df, drop_key=None):
    out = {(r[0], str(r.bucket_ts), r.value, r.is_gap)
           for r in df.collect()}
    if drop_key is not None:
        out = {t for t in out if t[0] != drop_key}
    return out


def test_closed_bucket_emission_equals_batch_minus_open_tails(
        spark, sf_dir, tmp_path):
    """Without a flush, the stream emits exactly the batch grid MINUS
    each key's final (still-open) bucket row — every interior bucket,
    observed or gap, matches bit-for-bit."""
    from openpolicedata_spark.operators.events import gap_fill
    from openpolicedata_spark.streaming import (
        run_available_now,
        stateful_gap_fill,
    )

    frame = _frame(spark, sf_dir)
    full = gap_fill(frame, key_col="user_id", ts_col="ts",
                    value_col="value", step_seconds=3600)
    w = Window.partitionBy("user_id").orderBy(F.col("bucket_ts").desc())
    expected = _rows(full.withColumn("__rn__", F.row_number().over(w))
                     .where(F.col("__rn__") > 1).drop("__rn__"))

    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 3)
    s = stateful_gap_fill(_stream(spark, frame, src),
                          key_col="user_id", ts_col="ts",
                          value_col="value", step_seconds=3600,
                          flush_delay=None)
    got = _rows(run_available_now(s, "gapfill_noflush"))
    assert got == expected and len(got) > 0


def test_timeout_flush_completes_full_batch_parity(spark, sf_dir,
                                                   tmp_path):
    """With flush_delay="0 seconds", a trailing sentinel batch times out every
    idle key's state and flushes the open tail bucket — output then
    equals the batch operator EXACTLY (sentinel key excluded: its own
    span stays open)."""
    from openpolicedata_spark.operators.events import gap_fill
    from openpolicedata_spark.streaming import (
        run_available_now,
        stateful_gap_fill,
    )

    frame = _frame(spark, sf_dir)
    expected = _rows(gap_fill(frame, key_col="user_id", ts_col="ts",
                              value_col="value", step_seconds=3600))

    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 3)
    sentinel = spark.createDataFrame(
        [(-1, "2024-06-01 00:00:00", 1.0, 0)],
        "user_id long, t string, value double, event_id long",
    ).select("user_id", F.col("t").cast("timestamp_ntz").alias("ts"),
             "value", "event_id")
    sentinel.coalesce(1).write.parquet(str(src / "zz_sentinel"))

    s = stateful_gap_fill(_stream(spark, frame, src),
                          key_col="user_id", ts_col="ts",
                          value_col="value", step_seconds=3600,
                          flush_delay="0 seconds")
    got = _rows(run_available_now(s, "gapfill_flush"), drop_key=-1)
    assert got == expected


def test_interp_mode_values_match_batch(spark, tmp_path):
    """interp gaps emit when the closing neighbor arrives, with the
    batch operator's exact fill arithmetic (same IEEE op order)."""
    from openpolicedata_spark.operators.events import gap_fill
    from openpolicedata_spark.streaming import (
        run_available_now,
        stateful_gap_fill,
    )

    rows = [(1, "2024-01-01 00:10:00", 1.0, 1),
            (1, "2024-01-01 04:20:00", 9.0, 2),
            (1, "2024-01-01 06:20:00", 2.0, 3)]
    frame = spark.createDataFrame(
        rows, "user_id long, t string, value double, event_id long",
    ).select("user_id", F.col("t").cast("timestamp_ntz").alias("ts"),
             "value", "event_id")
    expected = _rows(gap_fill(frame, key_col="user_id", ts_col="ts",
                              value_col="value", step_seconds=3600,
                              mode="interp"))
    # the open tail (hour 6) only flushes via the sentinel batch
    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 3)
    sentinel = spark.createDataFrame(
        [(-1, "2024-06-01 00:00:00", 1.0, 0)],
        "user_id long, t string, value double, event_id long",
    ).select("user_id", F.col("t").cast("timestamp_ntz").alias("ts"),
             "value", "event_id")
    sentinel.coalesce(1).write.parquet(str(src / "zz_sentinel"))
    s = stateful_gap_fill(_stream(spark, frame, src),
                          key_col="user_id", ts_col="ts",
                          value_col="value", step_seconds=3600,
                          mode="interp", flush_delay="0 seconds")
    got = _rows(run_available_now(s, "gapfill_interp"), drop_key=-1)
    assert got == expected
    # and the interpolated interior values are the exact rationals
    by_ts = {t[1]: t[2] for t in got}
    assert by_ts["2024-01-01 01:00:00"] == 3.0
    assert by_ts["2024-01-01 02:00:00"] == 5.0
    assert by_ts["2024-01-01 03:00:00"] == 7.0
    assert by_ts["2024-01-01 05:00:00"] == 5.5


def test_late_rows_error_and_drop_and_validation(spark, tmp_path):
    """A row whose bucket precedes the key's open bucket fails loudly
    under 'error' and is discarded under 'drop'; NULL values are
    non-observations in both modes."""
    from openpolicedata_spark.streaming import (
        run_available_now,
        stateful_gap_fill,
    )

    def _df(rows):
        return spark.createDataFrame(
            rows, "user_id long, t string, value double, event_id long",
        ).select("user_id",
                 F.col("t").cast("timestamp_ntz").alias("ts"),
                 "value", "event_id")

    b1 = _df([(1, "2024-01-01 05:00:00", 5.0, 1)])
    b2 = _df([(1, "2024-01-01 01:00:00", 1.0, 2),     # late
              (1, "2024-01-01 07:00:00", 7.0, 3),
              (1, "2024-01-01 06:30:00", None, 4)])   # NULL: ignored
    for policy in ("error", "drop"):
        src = tmp_path / f"src_{policy}"
        src.mkdir()
        b1.coalesce(1).write.parquet(str(src / "b0"))
        b2.coalesce(1).write.parquet(str(src / "b1"))
        s = stateful_gap_fill(_stream(spark, b1, src),
                              key_col="user_id", ts_col="ts",
                              value_col="value", step_seconds=3600,
                              late_policy=policy, flush_delay=None)
        if policy == "error":
            with pytest.raises(Exception, match="late row"):
                run_available_now(s, f"gapfill_{policy}")
        else:
            got = _rows(run_available_now(s, f"gapfill_{policy}"))
            # hour 5 closed by hour 7; gap at 6 LOCF-filled; late row gone
            assert got == {
                (1, "2024-01-01 05:00:00", 5.0, False),
                (1, "2024-01-01 06:00:00", 5.0, True),
            }
    with pytest.raises(ValueError, match="mode"):
        stateful_gap_fill(b1, mode="cubic")
    with pytest.raises(ValueError, match="late_policy"):
        stateful_gap_fill(b1, late_policy="rewind")


def test_batch_input_delegates_to_gap_fill(spark, sf_dir):
    from openpolicedata_spark.operators.events import gap_fill
    from openpolicedata_spark.streaming import stateful_gap_fill

    frame = _frame(spark, sf_dir)
    a = _rows(stateful_gap_fill(frame, key_col="user_id", ts_col="ts",
                                value_col="value", step_seconds=3600))
    b = _rows(gap_fill(frame, key_col="user_id", ts_col="ts",
                       value_col="value", step_seconds=3600))
    assert a == b and len(a) > 0
