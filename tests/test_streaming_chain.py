"""Round 13: multi-stateful chaining (stream-stream join → windowed
aggregate in ONE query, VERDICT r12 #3) and the observability surface
(state-store reader + observe() per-batch metrics, VERDICT r12 #4)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.streaming import (
    enrich_within_window,
    enriched_window_counts,
    observe_rows,
    observed_metrics,
    read_events_stream,
    read_query_state,
    run_available_now,
)


def _events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def _events_batch(spark, sf_dir):
    from openpolicedata_spark.sources.file import read_parquet_repaired

    return read_parquet_repaired(spark, _events_path(sf_dir))


def _heartbeat_file(spark, batch, watch, tmp_path):
    """Far-future rows on BOTH sides so every watermark passes every
    real window (the r12 rules: the right heartbeat must survive the
    side's % filter — Spark's % is sign-following — and must land as
    a plain FILE, the file source does not recurse into subdirs)."""
    import glob as _glob
    import shutil

    ts_t = dict(batch.dtypes)["ts"]
    hb = (spark.createDataFrame(
        [(10**9, "2030-01-01 00:00:00", -1, "purchase", 0.0, "{}"),
         (10**9 + 1, "2030-01-01 00:00:00", -3, "click", 0.0, "{}")],
        "event_id long, t string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.col("t").cast(ts_t)).drop("t")
        .select(*batch.columns))
    hbdir = tmp_path / "hb_stage"
    hb.coalesce(1).write.parquet(str(hbdir))
    shutil.move(_glob.glob(str(hbdir / "part-*.parquet"))[0],
                str(watch / "b.parquet"))
    return hb


def _sides(df):
    l = (df.where(F.col("event_type") == "purchase")
         .select("user_id", "ts", "event_id"))
    r = (df.where((F.col("event_type") == "click")
                  & (F.col("user_id") % 3 == 0))
         .select("user_id", "ts", "event_id", "value"))
    return l, r


def test_chained_join_then_window_agg_equals_batch(spark, sf_dir,
                                                   tmp_path):
    """THE chained shape (round 13): stream-stream inner join feeding
    a tumbling-window aggregate in one streaming query must equal the
    batch range-join + groupBy of the same expression — counts AND the
    DECIMAL-exact value sums per (window, user). Append mode is the
    chained-stateful requirement; the two-sided heartbeat finalizes
    every real window."""
    import shutil

    watch = tmp_path / "ev"
    watch.mkdir()
    shutil.copy(_events_path(sf_dir), str(watch / "a.parquet"))
    batch = _events_batch(spark, sf_dir)
    hb = _heartbeat_file(spark, batch, watch, tmp_path)

    lb, rb = _sides(batch.unionByName(hb))
    exp_df = enriched_window_counts(
        lb, rb, key="user_id", ts_col="ts", join_window="30 minutes",
        agg_window="6 hours", value_col="value")
    expected = {(r.w_start, r.user_id): (r.n_pairs, r.sum_value)
                for r in exp_df.collect()}
    assert len(expected) > 0

    s = read_events_stream(spark, str(watch))
    ls, rs = _sides(s)
    got_df = run_available_now(
        enriched_window_counts(ls, rs, key="user_id", ts_col="ts",
                               join_window="30 minutes",
                               agg_window="6 hours", value_col="value"),
        "chain_agg", timeout_s=300, output_mode="append")
    got = {(r.w_start, r.user_id): (r.n_pairs, r.sum_value)
           for r in got_df.collect()}
    assert got == expected


def _mk_kv(spark, rows):
    return (spark.createDataFrame(rows, "k long, ts string, v double")
            .withColumn("ts", F.col("ts").cast("timestamp")))


def _drain_foreach(agg, ck):
    q = (agg.writeStream.foreachBatch(lambda df, bid: df.count())
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
        q.awaitTermination(30)
    return [json.loads(p.json) for p in q.recentProgress]


def test_chain_late_row_evicted_at_join_not_aggregate(spark, tmp_path):
    """Watermark propagation through the chain (the VERDICT r12 #3
    pin): a row older than the watermark is evicted by the JOIN's
    state (progress attributes it to `symmetricHashJoin`), never
    reaching the downstream aggregate (`stateStoreSave` drops 0) —
    the watermark the aggregate sees is the JOIN's propagated one,
    not its own recomputation."""
    import os

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _mk_kv(spark, [(1, "2024-01-01 00:05:00", 1.0),
                   (-3, "2024-02-01 00:00:00", 0.0)]) \
        .coalesce(1).write.parquet(ldir)
    _mk_kv(spark, [(1, "2024-01-01 00:10:00", 10.0),
                   (-4, "2024-02-01 00:00:00", 0.0)]) \
        .coalesce(1).write.parquet(rdir)

    def chain():
        ls = spark.readStream.schema(
            "k long, ts timestamp, v double").parquet(ldir)
        rs = spark.readStream.schema(
            "k long, ts timestamp, v double").parquet(rdir)
        return enriched_window_counts(
            ls, rs, key="k", ts_col="ts", join_window="30 minutes",
            agg_window="6 hours", watermark="10 minutes")

    ck = str(tmp_path / "ck")
    progs = _drain_foreach(chain(), ck)
    # both stateful operators live in ONE query
    ops = {o["operatorName"] for p in progs
           for o in p.get("stateOperators", [])}
    assert {"symmetricHashJoin", "stateStoreSave"} <= ops, ops

    # a LATE left row (behind the 2024-02-01 − 10 min watermark)
    # arrives on restart: dropped at the JOIN, aggregate untouched
    import glob as _glob
    import shutil

    stage = tmp_path / "late_stage"
    _mk_kv(spark, [(1, "2024-01-01 00:06:00", 99.0)]) \
        .coalesce(1).write.parquet(str(stage))
    shutil.move(_glob.glob(str(stage / "part-*.parquet"))[0],
                os.path.join(ldir, "late.parquet"))
    progs2 = _drain_foreach(chain(), ck)
    drops = {o["operatorName"]: o["numRowsDroppedByWatermark"]
             for p in progs2 for o in p.get("stateOperators", [])}
    assert drops["symmetricHashJoin"] == 1, drops
    assert drops["stateStoreSave"] == 0, drops


def test_observe_rows_metrics_per_batch_through_a_sink(spark, sf_dir,
                                                       tmp_path):
    """observe() metrics ride a SINK's own plan (round 13): wrapping
    the stream feeding scd2_enrich_sink in observe_rows surfaces
    per-batch admitted-row counts in the progress the sink now
    returns — per-batch observability with zero extra passes. The
    observed counts must equal each micro-batch file's row count and
    sum to the published table."""
    from _stream_helpers import file_stream, write_ordered_splits
    from openpolicedata_spark.streaming import (
        read_enriched,
        scd2_enrich_sink,
        scd2_sink,
    )

    frame = (_events_batch(spark, sf_dir)
             .where(F.col("user_id") % 10 == 8)
             .selectExpr("user_id", "event_id", "ts",
                         "'U' AS op", "event_type"))
    dsrc = tmp_path / "dsrc"
    dsrc.mkdir()
    write_ordered_splits(frame, dsrc, 1)
    dim_out = str(tmp_path / "dim")
    scd2_sink(file_stream(spark, frame, dsrc), dim_out, "user_id",
              "ts", ["event_type"], tiebreak_col="event_id",
              op_col="op")

    events = frame.select("user_id", "event_id", "ts")
    esrc = tmp_path / "esrc"
    esrc.mkdir()
    write_ordered_splits(events, esrc, 3)
    per_file = [spark.read.parquet(str(esrc / f"b{i}")).count()
                for i in range(3)]
    out = str(tmp_path / "enriched")
    progs = scd2_enrich_sink(
        observe_rows(file_stream(spark, events, esrc), "enrich_in"),
        dim_out, out, "user_id", "ts")
    seen = [(p["batchId"], p["observedMetrics"]["enrich_in"]["rows"])
            for p in progs if "enrich_in" in p.get("observedMetrics", {})]
    # measured (round 13): observed metrics accumulate across EVERY
    # evaluation of the micro-batch's plan within the batch — the
    # sink's head(1) empty-guard probe scans exactly one row (single
    # input partition) before the real pass, so each batch reports
    # per-file + 1. A foreachBatch body that re-evaluates its frame
    # re-counts it; localCheckpoint the frame if exact-once metrics
    # matter more than the probe's cheapness.
    assert [n for _, n in seen] == [n + 1 for n in per_file], (
        seen, per_file)
    assert read_enriched(spark, out).count() == sum(per_file)


def test_observed_metrics_reader_on_memory_query(spark, tmp_path):
    """The observed_metrics reader pairs batch ids with the metric
    dicts from any StreamingQuery handle (here: gap-fill through the
    memory sink), skipping empty triggers."""
    src = str(tmp_path / "src")
    _mk_kv(spark, [(1, "2024-01-01 00:00:00", 1.0),
                   (1, "2024-01-01 02:00:00", 3.0),
                   (2, "2024-01-01 01:00:00", 7.0)]) \
        .coalesce(1).write.parquet(src)
    from openpolicedata_spark.streaming import stateful_gap_fill

    gs = spark.readStream.schema(
        "k long, ts timestamp, v double").parquet(src)
    gf = observe_rows(
        stateful_gap_fill(gs, key_col="k", ts_col="ts", value_col="v",
                          step_seconds=3600, flush_delay=None),
        "gap_out", {"rows": F.count(F.lit(1)),
                    "gaps": F.sum(F.col("is_gap").cast("long"))})
    q = (gf.writeStream.format("memory").queryName("gap_obs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = observed_metrics(q, "gap_out")
    # one data batch: key 1 emits buckets 0,1 (one gap), key 2 holds
    assert len(got) == 1
    assert got[0][1]["rows"] == 2 and got[0][1]["gaps"] == 1
    assert spark.table("gap_obs").count() == 2


def test_read_query_state_matches_gap_fill_invariant(spark, tmp_path):
    """Spark 4's state data source reads stateful_gap_fill's live
    state off the checkpoint: exactly ONE open observation per key,
    equal to each key's max bucket and that bucket's max value — the
    operator's state invariant, auditable without the query."""
    src = str(tmp_path / "src")
    _mk_kv(spark, [(1, "2024-01-01 00:10:00", 1.0),
                   (1, "2024-01-01 00:20:00", 5.0),   # same bucket, max
                   (1, "2024-01-01 03:00:00", 4.0),
                   (2, "2024-01-01 01:00:00", 7.0)]) \
        .coalesce(1).write.parquet(src)
    from openpolicedata_spark.streaming import stateful_gap_fill

    gs = spark.readStream.schema(
        "k long, ts timestamp, v double").parquet(src)
    gf = stateful_gap_fill(gs, key_col="k", ts_col="ts", value_col="v",
                           step_seconds=3600, flush_delay=None)
    ck = str(tmp_path / "ck")
    _drain_foreach(gf, ck)
    st = read_query_state(spark, ck)
    got = {(r.k, r.ob, r.ov) for r in st.collect()}
    # epoch-hour buckets: 2024-01-01T03 = 473355, T01 = 473353
    assert got == {(1, 473355, 4.0), (2, 473353, 7.0)}
    # raw (unflattened) shape carries the engine's key/value structs
    raw = read_query_state(spark, ck, flatten=False)
    assert {"key", "value", "partition_id"} <= set(raw.columns)


def test_chained_dedup_then_window_agg_equals_batch(spark, sf_dir,
                                                    tmp_path):
    """The OTHER multi-stateful pair a real ingest runs (round 13):
    dropDuplicatesWithinWatermark chained into a tumbling-window
    count in one query — at-least-once repair feeding the aggregate
    directly. Duplicate delivery simulated by doubling the source
    file; the chain must equal the batch dropDuplicates + groupBy on
    the single copy."""
    import shutil

    from openpolicedata_spark.streaming import (
        dedup_events,
        windowed_event_counts,
    )

    watch = tmp_path / "ev"
    watch.mkdir()
    shutil.copy(_events_path(sf_dir), str(watch / "a.parquet"))
    shutil.copy(_events_path(sf_dir), str(watch / "b.parquet"))

    batch = _events_batch(spark, sf_dir)
    expected = {(r.w_start, r.event_type): (r.n_events, r.sum_value)
                for r in windowed_event_counts(
                    dedup_events(batch), window="6 hours").collect()}

    s = read_events_stream(spark, str(watch))
    got_df = run_available_now(
        windowed_event_counts(dedup_events(s), window="6 hours"),
        "dedup_chain", timeout_s=300, output_mode="append")
    got = {(r.w_start, r.event_type): (r.n_events, r.sum_value)
           for r in got_df.collect()}
    # the stream's final windows may be withheld (no event advances
    # the watermark past them) — every emitted window must match the
    # batch value, and most windows must have emitted
    assert len(got) > 0.8 * len(expected)
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])


def test_three_stream_join_chain_and_boundaries(spark, tmp_path):
    """The measured chaining boundary map (round 13): a SECOND
    stream-stream join requires its input to carry exactly ONE
    event-time column (drop_right_time=True on the first enrich),
    while keeping both raises the engine's multiple-event-time error;
    a custom stateful operator after a join needs APPEND mode (update
    is rejected). The three-stream chain equals the batch double
    range join exactly under the all-sides heartbeat flush."""
    import os

    # crafted overlaps: key 1 has a,b,c inside 20 min (1 triple via
    # two b-matches x one c), key 2 misses the c window, key 3 has
    # no b match; heartbeats flush all three watermarks
    a_rows = [(1, "2024-01-01 00:10:00", 100),
              (2, "2024-01-01 02:00:00", 101),
              (3, "2024-01-01 04:00:00", 102),
              (-9, "2030-01-01 00:00:00", 900)]
    b_rows = [(1, "2024-01-01 00:15:00", 200),
              (1, "2024-01-01 00:25:00", 201),
              (2, "2024-01-01 02:05:00", 202),
              (-9, "2030-01-01 00:00:00", 901)]
    c_rows = [(1, "2024-01-01 00:20:00", 300),
              (2, "2024-01-01 03:00:00", 301),   # outside 20 min
              (3, "2024-01-01 04:05:00", 302),
              (-9, "2030-01-01 00:00:00", 902)]
    schema = "user_id long, t string, event_id long"

    def _mk(rows):
        return (spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("t").cast("timestamp"))
                .drop("t").select("user_id", "ts", "event_id"))

    dirs = {}
    for nm, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
        d = str(tmp_path / nm)
        _mk(rows).coalesce(1).write.parquet(d)
        dirs[nm] = d

    def chain(a, b, c):
        ab = enrich_within_window(a, b, window="20 minutes",
                                  right_prefix="b_",
                                  drop_right_time=True)
        return enrich_within_window(ab, c, window="20 minutes",
                                    right_prefix="c_")

    expected = {(r.event_id, r.b_event_id, r.c_event_id)
                for r in chain(_mk(a_rows), _mk(b_rows),
                               _mk(c_rows)).collect()
                if r.event_id < 900}
    assert expected == {(100, 200, 300), (100, 201, 300)}

    def streams():
        return [spark.readStream.schema(_mk(a_rows).schema)
                .parquet(dirs[nm]) for nm in ("a", "b", "c")]

    got_df = run_available_now(chain(*streams()), "chain3",
                               timeout_s=300)
    got = {(r.event_id, r.b_event_id, r.c_event_id)
           for r in got_df.collect() if r.event_id < 900}
    assert got == expected

    # boundary 1: WITHOUT drop_right_time the second join must refuse
    # (two event-time columns reach it)
    a, b, c = streams()
    ab_two_ts = enrich_within_window(a, b, window="20 minutes",
                                     right_prefix="b_")
    with pytest.raises(Exception,
                       match="event time|EVENT_TIME"):
        run_available_now(
            enrich_within_window(ab_two_ts, c, window="20 minutes",
                                 right_prefix="c_"),
            "chain3_two_ts", timeout_s=120)

    # boundary 2: custom stateful after a join needs APPEND mode
    from pyspark.sql.streaming.state import GroupStateTimeout

    def upd(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for p in pdfs:
            n += len(p)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    a, b, _ = streams()
    ab = enrich_within_window(a, b, window="20 minutes",
                              right_prefix="b_",
                              drop_right_time=True)
    upd_mode = ab.groupBy("user_id").applyInPandasWithState(
        upd, "user_id long, n long", "n long", "update",
        GroupStateTimeout.NoTimeout)
    with pytest.raises(Exception, match="[Uu]pdate output mode"):
        run_available_now(upd_mode, "chain3_update", timeout_s=120)


def test_state_schema_change_on_checkpoint_is_refused(spark, tmp_path):
    """Round 13 (operational pin): a stateful query's STATE STRUCT is
    part of its checkpoint contract — resuming the SAME checkpoint
    with a widened state schema must FAIL LOUDLY (the engine's state
    schema compatibility check), never silently reinterpret persisted
    state bytes. The operational path at 100 TB is a NEW checkpoint +
    backfill; this pins that the engine enforces it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, v long")
    rows.coalesce(1).write.parquet(str(src / "b0"))
    stream = (spark.readStream.schema(rows.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*/"))

    def drain(state_schema, fn):
        # foreachBatch, not the memory sink: memory refuses checkpoint
        # RECOVERY outright ("does not support recovering"), so only a
        # recoverable sink reaches the state schema check at all
        got = []

        def sink(bdf, _bid):
            got.extend(tuple(r) for r in bdf.collect())

        out = (stream.groupBy("k").applyInPandasWithState(
            fn, "k long, n long", state_schema,
            "update", GroupStateTimeout.NoTimeout))
        q = (out.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return got

    def count_fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    assert set(drain("n long", count_fn)) == {(1, 2), (2, 1)}

    # second batch arrives; the operator now wants a WIDER state
    rows2 = spark.createDataFrame([(1, 12)], "k long, v long")
    rows2.coalesce(1).write.parquet(str(src / "b1"))

    def count_fn_wide(key, pdfs, state):
        n, extra = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n, extra + 1))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    with pytest.raises(Exception) as ei:
        drain("n long, extra long", count_fn_wide)
    msg = str(ei.value)
    assert ("STATE_STORE" in msg or "StateSchema" in msg
            or "state schema" in msg.lower()), msg[:500]

    # same schema resumes cleanly and folds the new batch
    assert (1, 3) in set(drain("n long", count_fn))


def _topk_expected(spark, frame, k=2):
    from pyspark.sql import Window as W

    counts = (frame.groupBy(F.window("ts", "6 hours").alias("w"),
                            "event_type")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("w_start"),
                      "event_type", "n"))
    ranked = counts.withColumn(
        "rank", F.row_number().over(
            W.partitionBy("w_start")
            .orderBy(F.col("n").desc(), F.col("event_type"))))
    return {tuple(r) for r in ranked.where(
        (F.col("rank") <= k) & (F.col("w_start") <
                                F.lit("2029-01-01").cast("timestamp")))
        .collect()}


def test_windowed_topk_sink_equals_batch(spark, sf_dir, tmp_path):
    """Round 13: the per-window top-k sink must publish, for every
    CLOSED window, exactly the batch top-k (count desc, key asc
    tiebreak) — a far-future heartbeat closes every real window, and
    its own window is excluded from both sides. Also pins the
    closure invariant the sink's rank depends on: every published
    window carries at least k distinct keys' rows from ONE batch."""
    import glob as _glob
    import shutil

    from openpolicedata_spark.streaming import (
        read_events_stream,
        read_topk,
        windowed_topk_sink,
    )

    watch = tmp_path / "ev"
    watch.mkdir()
    shutil.copy(_events_path(sf_dir), str(watch / "a.parquet"))
    batch = _events_batch(spark, sf_dir)
    ts_t = dict(batch.dtypes)["ts"]
    hb = (spark.createDataFrame(
        [(10**9, "2030-01-01 00:00:00", -1, "hb", 0.0, "{}")],
        "event_id long, t string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.col("t").cast(ts_t)).drop("t")
        .select(*batch.columns))
    hbdir = tmp_path / "hb_stage"
    hb.coalesce(1).write.parquet(str(hbdir))
    shutil.move(_glob.glob(str(hbdir / "part-*.parquet"))[0],
                str(watch / "b.parquet"))

    expected = _topk_expected(spark, batch.unionByName(hb), k=2)
    assert expected and len({w for w, _, _, _ in expected}) > 1
    # ties exist in real data → the key tiebreak is load-bearing
    out = str(tmp_path / "topk")
    s = read_events_stream(spark, str(watch))
    windowed_topk_sink(s, out, k=2, window="6 hours",
                       watermark="0 seconds", query_name="wtopk_t1")
    got = {tuple(r) for r in read_topk(spark, out).where(
        F.col("w_start") < F.lit("2029-01-01").cast("timestamp"))
        .select("w_start", "event_type", "n", "rank").collect()}
    assert got == expected


def test_windowed_topk_sink_replay_is_exactly_once(spark, sf_dir,
                                                   tmp_path):
    """Round 13: redelivering a committed batch (commits-log deletion,
    the established crash simulation) must NOT duplicate any window's
    rows — directory presence is the marker."""
    import glob as _glob
    import os
    import shutil

    from openpolicedata_spark.streaming import (
        read_events_stream,
        read_topk,
        windowed_topk_sink,
    )

    watch = tmp_path / "ev"
    watch.mkdir()
    shutil.copy(_events_path(sf_dir), str(watch / "a.parquet"))
    batch = _events_batch(spark, sf_dir)
    ts_t = dict(batch.dtypes)["ts"]
    hb = (spark.createDataFrame(
        [(10**9, "2030-01-01 00:00:00", -1, "hb", 0.0, "{}")],
        "event_id long, t string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.col("t").cast(ts_t)).drop("t")
        .select(*batch.columns))
    hbdir = tmp_path / "hb_stage"
    hb.coalesce(1).write.parquet(str(hbdir))
    shutil.move(_glob.glob(str(hbdir / "part-*.parquet"))[0],
                str(watch / "b.parquet"))

    out = str(tmp_path / "topk")
    ckpt = str(tmp_path / "ckpt")

    def drain(name):
        s = read_events_stream(spark, str(watch),
                               max_files_per_trigger=1)
        windowed_topk_sink(s, out, k=2, window="6 hours",
                           watermark="0 seconds", checkpoint_dir=ckpt,
                           query_name=name)

    drain("wtopk_r1")
    first = sorted(tuple(r) for r in read_topk(spark, out).collect())
    assert first
    # redeliver the last committed batch
    last = max(int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
               if f.isdigit())
    os.remove(os.path.join(ckpt, "commits", str(last)))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.isfile(crc):
        os.remove(crc)
    drain("wtopk_r2")
    again = sorted(tuple(r) for r in read_topk(spark, out).collect())
    assert again == first
