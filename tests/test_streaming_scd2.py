"""streaming.scd2_sink — the streaming face of merge.scd2_intervals
(round 11, VERDICT r10 item 1): batch ≡ stream parity on the q200
generative CDC log, cross-batch compression/close/delete semantics,
marker-row exactly-once replay, and the late-row policy."""

import pytest
from pyspark.sql import functions as F

from _stream_helpers import file_stream as _stream
from _stream_helpers import write_ordered_splits as _write_ordered_splits


def _q200_frame(spark, sf_dir):
    """The q200 generative delete-aware CDC log: every 7th event is a
    DELETE with a junked payload (reversed event_type) that must be
    ignored, and every 11th non-delete op is NULL — an UPSERT by the
    pinned CDC convention (ADVICE r11), so the parity laws pin the
    NULL-op coalesce in the sink too."""
    from openpolicedata_spark.sources.file import read_parquet_repaired

    e = read_parquet_repaired(spark, f"{sf_dir}/events.parquet")
    return e.selectExpr(
        "user_id", "event_id", "ts",
        "CASE WHEN event_id % 7 = 0 THEN 'D' "
        "WHEN event_id % 11 = 0 THEN NULL ELSE 'U' END AS op",
        "CASE WHEN event_id % 7 = 0 THEN reverse(event_type) "
        "ELSE event_type END AS event_type")


def _versions(spark, out):
    from openpolicedata_spark.streaming import read_scd2

    return {tuple(r) for r in
            read_scd2(spark, out)
            .select("user_id", "event_type", "valid_from", "valid_to",
                    "is_current").collect()}


def test_scd2_sink_stream_equals_batch_on_q200_log(spark, tmp_path):
    """Folding the q200 delete-aware log through 5 in-order
    micro-batches must produce EXACTLY scd2_intervals' output on the
    whole log — compression, delete closes, re-inserts, and open tails
    all stitch correctly across batch boundaries."""
    from openpolicedata_spark.operators.merge import scd2_intervals
    from openpolicedata_spark.streaming import scd2_sink

    frame = _q200_frame(spark, "/root/testdata/sf0.001")
    expected = {tuple(r) for r in scd2_intervals(
        frame, "user_id", "ts", ["event_type"],
        tiebreak_col="event_id", op_col="op")
        .select("user_id", "event_type", "valid_from", "valid_to",
                "is_current").collect()}

    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 5)
    out = str(tmp_path / "dim")
    scd2_sink(_stream(spark, frame, src), out, "user_id", "ts",
              ["event_type"], tiebreak_col="event_id", op_col="op")
    assert _versions(spark, out) == expected


def test_scd2_sink_cross_batch_semantics(spark, tmp_path):
    """The three boundary laws, one key each, split so every law
    crosses a batch boundary: (a) a no-op re-emission in a later batch
    compresses away; (b) a delete in a later batch closes the open
    version and delete runs compress; (c) a re-insert after a delete
    is a NEW version even with the same value."""
    from openpolicedata_spark.streaming import scd2_sink

    schema = "k long, cid long, t string, op string, v string"

    def _df(rows):
        return (spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("t").cast("timestamp_ntz"))
                .drop("t")
                .select("k", "cid", "ts", "op", "v"))

    b1 = _df([
        (1, 1, "2024-01-01", "U", "A"),
        (2, 2, "2024-01-01", "U", "X"),
        (3, 3, "2024-01-01", "U", "P"),
        (3, 4, "2024-01-02", "D", "junk"),
    ])
    b2 = _df([
        (1, 5, "2024-01-03", "U", "A"),     # (a) no-op across batches
        (2, 6, "2024-01-03", "D", "junk"),  # (b) delete closes
        (2, 7, "2024-01-04", "D", "junk2"), # (b) delete run compresses
        (3, 8, "2024-01-05", "U", "P"),     # (c) re-insert, same value
    ])
    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b0"))
    b2.coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "dim")
    from openpolicedata_spark.streaming import read_scd2

    scd2_sink(_stream(spark, b1, src), out, "k", "ts", ["v"],
              tiebreak_col="cid", op_col="op")
    got = sorted((r.k, r.v, str(r.valid_from)[:10],
                  None if r.valid_to is None else str(r.valid_to)[:10],
                  r.is_current)
                 for r in read_scd2(spark, out).collect())
    assert got == [
        (1, "A", "2024-01-01", None, True),          # (a) one version
        (2, "X", "2024-01-01", "2024-01-03", False), # (b) closed once
        (3, "P", "2024-01-01", "2024-01-02", False),
        (3, "P", "2024-01-05", None, True),          # (c) new version
    ]


def test_scd2_sink_marker_replay_guard_and_incremental(spark, tmp_path):
    """With a persistent checkpoint: applied batch ids ride as marker
    rows inside the atomically-swapped table; re-invoking after new
    data folds only the new file (never re-folding the old ones), and
    the version output stays exactly scd2_intervals of everything
    delivered so far."""
    from openpolicedata_spark.operators.merge import scd2_intervals
    from openpolicedata_spark.streaming import scd2_sink

    frame = _q200_frame(spark, "/root/testdata/sf0.001").where(
        F.col("user_id") % 10 == 3)
    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 3)
    # hold the last file back: rename it out of the glob
    import os

    held = str(tmp_path / "held")
    os.rename(str(src / "b2"), held)
    out = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        scd2_sink(_stream(spark, frame, src), out, "user_id", "ts",
                  ["event_type"], tiebreak_col="event_id", op_col="op",
                  checkpoint_dir=ckpt)

    drain()
    raw = spark.read.parquet(out)
    assert raw.where(F.col("__kind__") == "m").count() == 2
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    n = frame.count()
    per = (n + 2) // 3
    wave1 = (frame.withColumn("__rn__", F.row_number().over(w))
             .where(F.col("__rn__") <= 2 * per).drop("__rn__"))
    exp1 = {tuple(r) for r in scd2_intervals(
        wave1, "user_id", "ts", ["event_type"],
        tiebreak_col="event_id", op_col="op")
        .select("user_id", "event_type", "valid_from", "valid_to",
                "is_current").collect()}
    assert _versions(spark, out) == exp1

    # re-drain with nothing new: no change, no extra markers
    drain()
    assert spark.read.parquet(out).where(
        F.col("__kind__") == "m").count() == 2
    assert _versions(spark, out) == exp1

    # release the held file: exactly one more fold, full-log parity
    os.rename(held, str(src / "b2"))
    drain()
    expected = {tuple(r) for r in scd2_intervals(
        frame, "user_id", "ts", ["event_type"],
        tiebreak_col="event_id", op_col="op")
        .select("user_id", "event_type", "valid_from", "valid_to",
                "is_current").collect()}
    assert _versions(spark, out) == expected
    assert spark.read.parquet(out).where(
        F.col("__kind__") == "m").count() == 3


def test_scd2_sink_late_rows_error_and_drop(spark, tmp_path):
    """A batch-2 row older than its key's stored last event fails the
    query loudly under late_policy='error' and is discarded (rest of
    the batch folds) under 'drop'."""
    from openpolicedata_spark.streaming import scd2_sink

    schema = "k long, cid long, t string, op string, v string"

    def _df(rows):
        return (spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("t").cast("timestamp_ntz"))
                .drop("t").select("k", "cid", "ts", "op", "v"))

    b1 = _df([(1, 5, "2024-01-05", "U", "A")])
    b2 = _df([(1, 2, "2024-01-02", "U", "LATE"),
              (2, 6, "2024-01-06", "U", "B")])
    for policy in ("error", "drop"):
        src = tmp_path / f"src_{policy}"
        src.mkdir()
        b1.coalesce(1).write.parquet(str(src / "b0"))
        b2.coalesce(1).write.parquet(str(src / "b1"))
        out = str(tmp_path / f"dim_{policy}")
        run = lambda: scd2_sink(
            _stream(spark, b1, src), out, "k", "ts", ["v"],
            tiebreak_col="cid", op_col="op", late_policy=policy)
        if policy == "error":
            with pytest.raises(Exception, match="late change"):
                run()
        else:
            run()
            got = _scd2_rows(spark, out)
            assert got == {(1, "A", True), (2, "B", True)}
    with pytest.raises(ValueError, match="late_policy"):
        scd2_sink(b1, "x", "k", "ts", ["v"], late_policy="rewrite")
    with pytest.raises(ValueError, match="value column"):
        scd2_sink(b1, "x", "k", "ts", [])


def _scd2_rows(spark, out):
    from openpolicedata_spark.streaming import read_scd2

    return {(r.k, r.v, r.is_current)
            for r in read_scd2(spark, out).collect()}


def test_scd2_sink_redelivered_row_is_absorbed_unguarded(spark,
                                                         tmp_path):
    """Without markers (ephemeral checkpoint), an individual change
    row redelivered in a LATER batch equals the stored last-event
    state and compresses to a no-op — at-least-once row delivery
    converges."""
    from openpolicedata_spark.streaming import scd2_sink

    schema = "k long, cid long, t string, op string, v string"

    def _df(rows):
        return (spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("t").cast("timestamp_ntz"))
                .drop("t").select("k", "cid", "ts", "op", "v"))

    b1 = _df([(1, 1, "2024-01-01", "U", "A"),
              (1, 2, "2024-01-02", "U", "B")])
    b2 = _df([(1, 2, "2024-01-02", "U", "B")])   # exact redelivery
    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b0"))
    b2.coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "dim")
    from openpolicedata_spark.streaming import read_scd2

    scd2_sink(_stream(spark, b1, src), out, "k", "ts", ["v"],
              tiebreak_col="cid", op_col="op")
    got = sorted((r.k, r.v, str(r.valid_from)[:10], r.is_current)
                 for r in read_scd2(spark, out).collect())
    assert got == [(1, "A", "2024-01-01", False),
                   (1, "B", "2024-01-02", True)]


def test_scd2_sink_row_per_batch_maximal_boundary_stress(spark,
                                                         tmp_path):
    """EVERY adjacent-row boundary becomes a batch boundary (one row
    per micro-batch) on a crafted log packing the nasty shapes —
    timestamp ties resolved by tiebreak, no-op runs, delete runs,
    re-insert after delete, interleaved keys — and the fold must still
    equal scd2_intervals exactly. This is the strongest split the
    in-order contract allows."""
    from openpolicedata_spark.operators.merge import scd2_intervals
    from openpolicedata_spark.streaming import scd2_sink

    schema = "k long, cid long, t string, op string, v string"
    rows = [
        (1, 1, "2024-01-01 00:00:00", "U", "A"),
        (2, 2, "2024-01-01 00:00:00", "U", "X"),
        (1, 3, "2024-01-02 00:00:00", "U", "A"),   # no-op
        (1, 4, "2024-01-02 00:00:00", "U", "B"),   # tie, tiebreak wins
        (2, 5, "2024-01-03 00:00:00", "D", "junk"),
        (2, 6, "2024-01-03 00:00:00", "D", "junk2"),  # delete run, tie
        (1, 7, "2024-01-04 00:00:00", "U", "B"),   # no-op
        (2, 8, "2024-01-05 00:00:00", "U", "X"),   # re-insert post-del
        (1, 9, "2024-01-06 00:00:00", "D", "zzz"),
        (1, 10, "2024-01-07 00:00:00", "U", "B"),  # re-insert same val
        (2, 11, "2024-01-07 00:00:00", "U", "Y"),
        (1, 12, "2024-01-08 00:00:00", "U", "B"),  # trailing no-op
    ]
    frame = (spark.createDataFrame(rows, schema)
             .withColumn("ts", F.col("t").cast("timestamp_ntz"))
             .drop("t").select("k", "cid", "ts", "op", "v"))
    expected = {tuple(r) for r in scd2_intervals(
        frame, "k", "ts", ["v"], tiebreak_col="cid", op_col="op")
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()}

    src = tmp_path / "src"
    src.mkdir()
    for i, row in enumerate(rows):
        (spark.createDataFrame([row], schema)
         .withColumn("ts", F.col("t").cast("timestamp_ntz"))
         .drop("t").select("k", "cid", "ts", "op", "v")
         .coalesce(1).write.parquet(str(src / f"b{i:02d}")))
    out = str(tmp_path / "dim")
    scd2_sink(_stream(spark, frame, src), out, "k", "ts", ["v"],
              tiebreak_col="cid", op_col="op", timeout_s=600)
    from openpolicedata_spark.streaming import read_scd2

    got = {tuple(r) for r in read_scd2(spark, out)
           .select("k", "v", "valid_from", "valid_to", "is_current")
           .collect()}
    assert got == expected


def test_scd2_sink_table_is_self_compacting(spark, tmp_path):
    """Each batch rewrites the dimension in ONE atomic swap, so the
    table's data-file count is bounded by the writer's partitioning —
    it must NOT grow with the number of folded batches (the
    append-style sinks need compact_index for this; the swap rewrite
    IS the compaction here)."""
    import glob

    from openpolicedata_spark.streaming import scd2_sink

    frame = _q200_frame(spark, "/root/testdata/sf0.001").where(
        F.col("user_id") % 10 == 6)
    src = tmp_path / "src"
    src.mkdir()
    _write_ordered_splits(frame, src, 6)
    out = str(tmp_path / "dim")
    scd2_sink(_stream(spark, frame, src), out, "user_id", "ts",
              ["event_type"], tiebreak_col="event_id", op_col="op")
    n_files = len(glob.glob(f"{out}/*.parquet"))
    assert 0 < n_files <= spark.sparkContext.defaultParallelism + 1, \
        n_files
    assert not glob.glob(f"{out}.__stage_*__"), "stage dir leaked"
    assert not glob.glob(f"{out}.__old__"), "swap-aside dir leaked"
