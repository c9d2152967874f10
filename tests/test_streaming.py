"""Streaming tests (SURVEY.md §5.2): memory-sink + processAllAvailable
(never sleep); file source driven by writing parquet files between
processAllAvailable calls so micro-batch boundaries are deterministic.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.pipeline.fixtures import START_BLOCK, make_ipfs_docs, make_raw_logs
from bigquery_etl_spark.streaming.dedup import watermarked_dedup
from bigquery_etl_spark.streaming.pipeline_stream import start_stream_pipeline
from bigquery_etl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _write_events(spark, path: str, rows: list[tuple], fname: str) -> None:
    _write_flat_parquet(spark.createDataFrame(rows, EVENTS_DDL), path, fname)


def _write_flat_parquet(df, path: str, fname: str) -> None:
    """The file streaming source lists only top-level files — flatten the
    part file Spark writes into ``path/fname``."""
    import glob
    import os
    import shutil
    import tempfile

    os.makedirs(path, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
        (part,) = glob.glob(f"{tmp}/out/part-*.parquet")
        shutil.copy(part, f"{path}/{fname}")


def _read_stream(spark, path: str):
    from pyspark.sql import types as T

    schema = spark.createDataFrame([], EVENTS_DDL).schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)


def _run_to_memory(df, name: str, mode: str):
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    return q


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    rows = [
        (1, _ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        (2, _ts("2024-01-01 00:55:00"), 1, "click", 2.0),
        (3, _ts("2024-01-01 01:05:00"), 2, "view", 3.0),
    ]
    src = str(tmp_path / "src")
    _write_events(spark, src, rows, "f1.parquet")
    stream = tumbling_window_agg(_read_stream(spark, src), watermark_delay="10 minutes")
    q = _run_to_memory(stream, "tumbling_out", "complete")
    try:
        got = {
            (r.ws, r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
        batch = {
            (r.ws, r.event_type): (r.n, r.sum_value)
            for r in tumbling_window_agg(spark.createDataFrame(rows, EVENTS_DDL)).collect()
        }
        assert got == batch
        assert got[(_ts("2024-01-01 00:00:00"), "click")] == (2, 3.0)
    finally:
        q.stop()


def test_sliding_and_session_windows_batch_form(spark):
    rows = [
        (1, _ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        (2, _ts("2024-01-01 00:20:00"), 1, "click", 1.0),
        (3, _ts("2024-01-01 02:00:00"), 1, "click", 1.0),
    ]
    df = spark.createDataFrame(rows, EVENTS_DDL)
    sliding = sliding_window_agg(df, duration="1 hour", slide="30 minutes").collect()
    # event at 00:05 falls in 2 hopping windows (23:30-00:30, 00:00-01:00)
    n_windows_for_e1 = sum(1 for r in sliding if r.ws <= _ts("2024-01-01 00:05:00") < r.we)
    assert n_windows_for_e1 == 2
    sessions = session_window_agg(df, gap="30 minutes").collect()
    # events 1+2 chain into one session (gap 15m), event 3 opens another
    assert sorted((r.n for r in sessions)) == [1, 2]
    s2 = next(r for r in sessions if r.n == 2)
    assert s2.ws == _ts("2024-01-01 00:05:00") and s2.we == _ts("2024-01-01 00:50:00")


def test_watermark_drops_late_event(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: advance watermark to 01:00 - 10min = 00:50
    _write_events(
        spark,
        src,
        [(1, _ts("2024-01-01 00:05:00"), 1, "click", 1.0),
         (2, _ts("2024-01-01 01:00:00"), 1, "click", 1.0)],
        "f1.parquet",
    )
    stream = tumbling_window_agg(
        _read_stream(spark, src), duration="30 minutes", watermark_delay="10 minutes"
    )
    q = _run_to_memory(stream, "late_out", "append")
    try:
        # batch 2: a late event for the already-finalized 00:00 window...
        _write_events(spark, src, [(3, _ts("2024-01-01 00:06:00"), 1, "click", 9.0)], "f2.parquet")
        # ...and batch 3: advance event time so windows finalize
        _write_events(spark, src, [(4, _ts("2024-01-01 02:00:00"), 1, "click", 1.0)], "f3.parquet")
        q.processAllAvailable()
        out = {r.ws: (r.n, r.sum_value) for r in spark.sql("SELECT * FROM late_out").collect()}
        # the 00:00-00:30 window finalized with ONLY event 1 — late event 3 dropped
        assert out[_ts("2024-01-01 00:00:00")] == (1, 1.0)
    finally:
        q.stop()


def test_watermarked_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(
        spark,
        src,
        [(1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
         (1, _ts("2024-01-01 00:00:30"), 1, "click", 1.0)],  # dup key within watermark
        "f1.parquet",
    )
    deduped = watermarked_dedup(_read_stream(spark, src), keys=["event_id"], delay="10 minutes")
    q = _run_to_memory(deduped.select("event_id", "user_id"), "dedup_out", "append")
    try:
        _write_events(spark, src, [(1, _ts("2024-01-01 00:01:00"), 1, "click", 1.0)], "f2.parquet")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        assert len(rows) == 1 and rows[0].event_id == 1
    finally:
        q.stop()


def test_sliding_window_streaming_mode(spark, tmp_path):
    """Hopping windows on an actual stream: one event lands in two
    overlapping windows; both finalize once the watermark passes."""
    src = str(tmp_path / "src")
    _write_events(spark, src, [(1, _ts("2024-01-01 00:45:00"), 1, "click", 2.0)], "f1.parquet")
    stream = sliding_window_agg(
        _read_stream(spark, src), duration="1 hour", slide="30 minutes",
        watermark_delay="10 minutes",
    )
    q = _run_to_memory(stream, "sliding_out", "append")
    try:
        _write_events(spark, src, [(2, _ts("2024-01-01 06:00:00"), 1, "click", 1.0)], "f2.parquet")
        q.processAllAvailable()
        got = {(r.ws, r.we): (r.n, r.sum_value) for r in spark.sql("SELECT * FROM sliding_out").collect()}
        assert got[(_ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))] == (1, 2.0)
        assert got[(_ts("2024-01-01 00:30:00"), _ts("2024-01-01 01:30:00"))] == (1, 2.0)
    finally:
        q.stop()


def test_session_window_streaming_mode(spark, tmp_path):
    """Session windows on an actual stream: sessions merge as events
    arrive across micro-batches; append mode emits after the watermark
    closes them."""
    src = str(tmp_path / "src")
    _write_events(
        spark,
        src,
        [(1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
         (2, _ts("2024-01-01 00:10:00"), 1, "click", 2.0)],  # same session (gap 10m < 30m)
        "f1.parquet",
    )
    stream = session_window_agg(
        _read_stream(spark, src), gap="30 minutes", watermark_delay="10 minutes"
    )
    q = _run_to_memory(stream, "session_out", "append")
    try:
        # a later event closes the first session once the watermark passes
        _write_events(spark, src, [(3, _ts("2024-01-01 05:00:00"), 1, "click", 1.0)], "f2.parquet")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM session_out").collect()
        finalized = {(r.ws, r.we): (r.n, r.sum_value) for r in rows}
        # events 1+2 merged into one session [00:00, 00:40) = last ts + gap
        assert finalized[(_ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:40:00"))] == (2, 3.0)
    finally:
        q.stop()


def test_stream_static_join(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, [(1, _ts("2024-01-01 00:00:00"), 7, "click", 1.0)], "f1.parquet")
    dim = spark.createDataFrame([(7, "GOLD")], "user_id long, tier string")
    joined = _read_stream(spark, src).join(F.broadcast(dim), "user_id", "left")
    q = _run_to_memory(joined.select("event_id", "tier"), "ssj_out", "append")
    try:
        rows = spark.sql("SELECT * FROM ssj_out").collect()
        assert rows[0].tier == "GOLD"
    finally:
        q.stop()


def test_stream_pipeline_exactly_once_replay(spark, tmp_path):
    raw = make_raw_logs(spark, START_BLOCK, START_BLOCK + 4)
    docs = make_ipfs_docs(spark, raw)
    src = str(tmp_path / "raw")
    _write_flat_parquet(raw, src, "batch1.parquet")

    def run(checkpoint: str):
        q = start_stream_pipeline(
            spark,
            raw_logs_dir=src,
            ipfs_docs=docs,
            warehouse_dir=str(tmp_path / "warehouse"),
            staging_dir=str(tmp_path / "staging"),
            checkpoint_dir=str(tmp_path / checkpoint),
        )
        q.awaitTermination()  # availableNow terminates when caught up

    run("cp1")
    mk = spark.read.parquet(str(tmp_path / "warehouse/marketplace_listings"))
    n1 = mk.count()
    assert n1 == 10  # 2 events x 5 blocks

    # fresh checkpoint = full replay (the crash-before-commit scenario);
    # idempotent merge must keep the warehouse unchanged
    run("cp2")
    mk2 = spark.read.parquet(str(tmp_path / "warehouse/marketplace_listings"))
    assert mk2.count() == n1
    assert mk2.select("block_number", "log_index").distinct().count() == n1


def test_stateful_per_key_cursor(spark, tmp_path):
    pytest.importorskip("pyspark.sql.streaming.state")
    from bigquery_etl_spark.streaming.stateful import per_key_cursor

    src = str(tmp_path / "src")
    _write_events(
        spark,
        src,
        [(10, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
         (11, _ts("2024-01-01 00:01:00"), 1, "click", 1.0),
         (20, _ts("2024-01-01 00:02:00"), 2, "view", 1.0)],
        "f1.parquet",
    )
    q = _run_to_memory(per_key_cursor(_read_stream(spark, src)), "cursor_out", "update")
    try:
        _write_events(spark, src, [(12, _ts("2024-01-01 00:03:00"), 1, "click", 1.0)], "f2.parquet")
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max(n_events) AS n, max(max_event_id) AS hw "
            "FROM cursor_out GROUP BY user_id"
        ).collect()
        got = {r.user_id: (r.n, r.hw) for r in rows}
        assert got[1] == (3, 12)  # state carried across micro-batches
        assert got[2] == (1, 20)
    finally:
        q.stop()


def test_stateful_per_key_cursor_tws(spark, tmp_path):
    """Same cursor semantics on the Spark 4 transformWithStateInPandas
    API (RocksDB state store)."""
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    # TWS speaks protobuf between the JVM and the Python state worker;
    # without a working google.protobuf the driver worker crashes.
    pytest.importorskip("google.protobuf.descriptor")
    from bigquery_etl_spark.streaming.stateful import per_key_cursor_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    _write_events(
        spark,
        src,
        [(10, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
         (11, _ts("2024-01-01 00:01:00"), 1, "click", 1.0),
         (20, _ts("2024-01-01 00:02:00"), 2, "view", 1.0)],
        "f1.parquet",
    )
    try:
        q = _run_to_memory(per_key_cursor_tws(_read_stream(spark, src)), "cursor_tws_out", "update")
        try:
            _write_events(spark, src, [(12, _ts("2024-01-01 00:03:00"), 1, "click", 1.0)], "f2.parquet")
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT user_id, max(n_events) AS n, max(max_event_id) AS hw "
                "FROM cursor_tws_out GROUP BY user_id"
            ).collect()
            got = {r.user_id: (r.n, r.hw) for r in rows}
            assert got[1] == (3, 12)
            assert got[2] == (1, 20)
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream inner interval join: right events within
    [l_ts, l_ts + 5m] on the same user match; result equals the batch
    twin of the same inputs."""
    from bigquery_etl_spark.streaming.joins import interval_join

    left_rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        (2, _ts("2024-01-01 00:20:00"), 2, "click", 2.0),
    ]
    right_rows = [
        (101, _ts("2024-01-01 00:03:00"), 1, "view", 10.0),  # within 5m of event 1
        (102, _ts("2024-01-01 00:10:00"), 1, "view", 11.0),  # outside the gap
        (103, _ts("2024-01-01 00:21:00"), 2, "view", 12.0),  # within 5m of event 2
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_events(spark, lsrc, left_rows, "f1.parquet")
    _write_events(spark, rsrc, right_rows, "f1.parquet")
    joined = interval_join(_read_stream(spark, lsrc), _read_stream(spark, rsrc))
    q = _run_to_memory(joined, "ssj_out", "append")
    try:
        got = {
            (r.l_event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
        assert got == {(1, 101), (2, 103)}
        batch = interval_join(
            spark.createDataFrame(left_rows, EVENTS_DDL),
            spark.createDataFrame(right_rows, EVENTS_DDL),
        )
        assert got == {(r.l_event_id, r.r_event_id) for r in batch.collect()}
    finally:
        q.stop()


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched left event is held in
    state until BOTH watermarks pass its join interval, then emitted
    with a NULL right side."""
    from bigquery_etl_spark.streaming.joins import interval_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_events(spark, lsrc, [(1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0)], "f1.parquet")
    _write_events(spark, rsrc, [(101, _ts("2024-01-01 00:30:00"), 9, "view", 1.0)], "f1.parquet")
    joined = interval_join(
        _read_stream(spark, lsrc), _read_stream(spark, rsrc), how="left_outer"
    )
    q = _run_to_memory(joined, "ssj_outer_out", "append")
    try:
        # push both watermarks far past 00:00 + 5m gap + 10m delay
        _write_events(spark, lsrc, [(2, _ts("2024-01-01 02:00:00"), 8, "click", 1.0)], "f2.parquet")
        _write_events(spark, rsrc, [(102, _ts("2024-01-01 02:00:00"), 9, "view", 1.0)], "f2.parquet")
        q.processAllAvailable()
        rows = {r.l_event_id: r for r in spark.sql("SELECT * FROM ssj_outer_out").collect()}
        assert rows[1].r_event_id is None  # unmatched left emitted with null right
    finally:
        q.stop()


def test_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """Exactly-once across restarts: a file-source -> parquet-sink query
    stopped and restarted from the same checkpoint neither loses nor
    reprocesses data (the reference's at-least-once cursor gap, §3.1,
    closed by Spark's checkpoint+WAL commit protocol)."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    def start():
        return (
            _read_stream(spark, src)
            .select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    _write_events(spark, src, [(1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0)], "f1.parquet")
    q = start()
    q.processAllAvailable()
    q.stop()

    _write_events(spark, src, [(2, _ts("2024-01-01 00:01:00"), 2, "view", 2.0)], "f2.parquet")
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert got == [1, 2]  # f1 not reprocessed after restart, f2 not lost


def test_view_maintenance_stream_exactly_once(spark, tmp_path):
    """CDF stream -> maintained view on a PointerStore, with epoch
    fencing: replaying EVERY batch (fresh checkpoint, same files) must
    not change the view — retractions applied twice would corrupt it."""
    import os

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bigquery_etl_spark.sources.pointer_store import PointerStore
    from bigquery_etl_spark.streaming.view_stream import (
        start_view_maintenance_stream,
    )

    schema = StructType(
        [
            StructField("g", StringType()),
            StructField("v", LongType()),
            StructField("_change_type", StringType()),
        ]
    )
    changes = str(tmp_path / "changes")
    os.makedirs(changes)
    view = str(tmp_path / "view")

    b1 = [("a", 10, "insert"), ("a", 20, "insert"), ("b", 5, "insert")]
    # b2: retract a=10 (update to 15), delete b entirely, insert c
    b2 = [
        ("a", 10, "update_preimage"),
        ("a", 15, "update_postimage"),
        ("b", 5, "delete"),
        ("c", 7, "insert"),
    ]
    _write_flat_parquet(spark.createDataFrame(b1, schema), changes, "c1.parquet")
    _write_flat_parquet(spark.createDataFrame(b2, schema), changes, "c2.parquet")

    def run(ckpt, app_id=None):
        q = start_view_maintenance_stream(
            spark, changes, schema, view, ckpt, ["g"], {"total": "v"},
            app_id=app_id,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "ckpt1"), app_id="orders-view")
    store = PointerStore(spark, view)
    expect = [("a", 35, 2), ("c", 7, 1)]  # b removed at count 0
    got = sorted(map(tuple, store.read().select("g", "total", "n_rows").collect()))
    assert got == expect
    assert store.current_meta() == {"app_id": "orders-view", "batch_id": 1}

    # full replay of the SAME logical stream (fresh checkpoint, same
    # app_id): every batch id re-delivered, all fenced off by the
    # committed epoch — view byte-identical
    run(str(tmp_path / "ckpt2"), app_id="orders-view")
    got2 = sorted(map(tuple, store.read().select("g", "total", "n_rows").collect()))
    assert got2 == expect
    assert store.current_meta() == {"app_id": "orders-view", "batch_id": 1}

    # a DIFFERENT incarnation must be refused, not silently skipped or
    # double-applied: batch ids are incomparable across app_ids
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="app_id"):
        run(str(tmp_path / "ckpt3"), app_id="other-stream")
    got3 = sorted(map(tuple, store.read().select("g", "total", "n_rows").collect()))
    assert got3 == expect  # view untouched by the refused stream


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Per-user streaming funnel state (two time-ordered micro-batches)
    must agree with the batch 3-join computation over the full data."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from bigquery_etl_spark.streaming.stateful import streaming_funnel

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    import datetime as dt

    def T(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # u1 full funnel across the batch split
        (1, T(1), 1, "view"), (1, T(2), 2, "click"),
        (1, T(11), 3, "purchase"),
        # u2: click BEFORE view never qualifies; stage stops at view
        (2, T(1), 4, "click"), (2, T(2), 5, "view"),
        (2, T(12), 6, "error"),
        # u3: purchase without click -> stage 1
        (3, T(3), 7, "view"), (3, T(13), 8, "purchase"),
        # u4: no view at all -> stage 0
        (4, T(4), 9, "click"), (4, T(14), 10, "purchase"),
    ]
    b1 = [r for r in rows if r[1] < T(10)]
    b2 = [r for r in rows if r[1] >= T(10)]
    incoming = str(tmp_path / "inc")
    os.makedirs(incoming)
    _write_flat_parquet(spark.createDataFrame(b1, schema), incoming, "b1.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_flat_parquet(spark.createDataFrame(b2, schema), incoming, "b2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    # last emitted stage per user
    out = spark.sql(
        "SELECT user_id, stage FROM funnel_state"
    ).groupBy("user_id").agg(F.max("stage").alias("stage"))
    got = dict((r.user_id, r.stage) for r in out.collect())
    assert got == {1: 3, 2: 1, 3: 1, 4: 0}


def test_tws_session_windows_with_timers(spark, tmp_path):
    """r4: timer-driven sessionization on transformWithStateInPandas —
    a session closes exactly when the WATERMARK passes last_event+gap
    (handleExpiredTimer), and a batch that jumps the gap before the
    timer fires closes the old session inline. RocksDB state store."""
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    pytest.importorskip("google.protobuf.descriptor")
    from bigquery_etl_spark.streaming.stateful import session_windows_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    # batch 1: user 1 has two events 1 min apart (one session);
    # user 2 one event
    _write_events(
        spark, src,
        [(10, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
         (11, _ts("2024-01-01 00:01:00"), 1, "click", 1.0),
         (20, _ts("2024-01-01 00:02:00"), 2, "view", 1.0)],
        "f1.parquet",
    )
    try:
        stream = session_windows_tws(
            _read_stream(spark, src).withWatermark("ts", "1 minute"),
            gap_seconds=300,
        )
        q = _run_to_memory(stream, "tws_sessions", "append")
        try:
            # batch 2: user 1 far-future event — advances the watermark
            # past both sessions' gap AND (being >gap later) would close
            # user 1's session inline anyway
            _write_events(
                spark, src,
                [(12, _ts("2024-01-01 01:00:00"), 1, "click", 1.0)],
                "f2.parquet",
            )
            q.processAllAvailable()
            # batch 3: advance watermark further so user 2's and user 1's
            # second session can also close via timers
            _write_events(
                spark, src,
                [(30, _ts("2024-01-01 02:00:00"), 3, "view", 1.0)],
                "f3.parquet",
            )
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT user_id, session_start, session_end, n_events "
                "FROM tws_sessions"
            ).collect()
            got = {
                (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
                for r in rows
            }
            assert (1, "2024-01-01 00:00:00", "2024-01-01 00:01:00", 2) in got
            assert (2, "2024-01-01 00:02:00", "2024-01-01 00:02:00", 1) in got
            assert (1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1) in got
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_session_out_of_order_merge(spark, tmp_path):
    """r5 (ADVICE): an out-of-order but in-watermark event must (a)
    LOWER session_start when it lands before the current start, and (b)
    MERGE two open sessions when it falls in the gap between them —
    the semantics Spark's built-in session_window has. The old
    single-session state emitted a too-late start and a split pair."""
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    pytest.importorskip("google.protobuf.descriptor")
    from bigquery_etl_spark.streaming.stateful import session_windows_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    # batch 1: user 1 has two events 8 min apart — with gap=5min these
    # open TWO sessions (neither may be force-closed: the watermark,
    # 30 min behind, has not passed either end+gap)
    _write_events(
        spark, src,
        [(10, _ts("2024-01-01 00:10:00"), 1, "click", 1.0),
         (11, _ts("2024-01-01 00:18:00"), 1, "click", 1.0)],
        "f1.parquet",
    )
    try:
        stream = session_windows_tws(
            _read_stream(spark, src).withWatermark("ts", "30 minutes"),
            gap_seconds=300,
        )
        q = _run_to_memory(stream, "tws_ooo_sessions", "append")
        try:
            # batch 2 (all in-watermark, out of order): 00:14 bridges the
            # two open sessions -> one merged session; 00:07 lowers its
            # start below the original first event
            _write_events(
                spark, src,
                [(12, _ts("2024-01-01 00:14:00"), 1, "click", 1.0),
                 (13, _ts("2024-01-01 00:07:00"), 1, "click", 1.0)],
                "f2.parquet",
            )
            q.processAllAvailable()
            # batch 3: far-future event advances the watermark past the
            # merged session's end+gap so its timer fires
            _write_events(
                spark, src,
                [(30, _ts("2024-01-01 02:00:00"), 3, "view", 1.0)],
                "f3.parquet",
            )
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT user_id, session_start, session_end, n_events "
                "FROM tws_ooo_sessions WHERE user_id = 1"
            ).collect()
            got = {
                (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
                for r in rows
            }
            assert got == {
                (1, "2024-01-01 00:07:00", "2024-01-01 00:18:00", 4)
            }
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_view_maintenance_from_lake_commit_log(spark, tmp_path):
    """r5: the materialized view maintains itself off the versioned
    lake's OWN commit log (versioned_lake readChangeFeed stream) — no
    parquet drop dir. After more commits land and the stream ticks
    again from its checkpoint, the view equals the aggregate of the
    current snapshot."""
    from bigquery_etl_spark.sources.pointer_store import PointerStore
    from bigquery_etl_spark.sources.versioned import VersionedTable
    from bigquery_etl_spark.streaming.view_stream import (
        start_view_maintenance_from_lake,
    )

    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    t.create(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)],
        "id long, grp string, amount double"))
    t.enable_change_feed(["id"])

    view_root = str(tmp_path / "view")
    q = start_view_maintenance_from_lake(
        spark, root, view_root, str(tmp_path / "ckpt"),
        keys=["grp"], sums={"total": "amount"},
    )
    try:
        q.processAllAvailable()
        # more commits: append + an upsert that MOVES a row across groups
        t.append(spark.createDataFrame([(4, "b", 7.0)],
                                       "id long, grp string, amount double"))
        t.upsert(spark.createDataFrame([(2, "b", 21.0)],
                                       "id long, grp string, amount double"),
                 ["id"])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.grp: r.total for r in PointerStore(spark, view_root).read().collect()
    }
    want = {
        r.grp: r.total
        for r in t.read().groupBy("grp").agg(
            F.sum("amount").alias("total")).collect()
    }
    assert got == want == {"a": 10.0, "b": 33.0}


def test_streaming_matview_from_changes_tvf_r11(spark, tmp_path):
    """r11 (VERDICT r10 item 8): CREATE STREAMING MATERIALIZED VIEW …
    AS SELECT … FROM CHANGES(TABLE t, NULL, NULL) drives the C23
    epoch-fenced streaming-MV fold end-to-end from SQL. Equivalence is
    the C23 standard: after arbitrary DML (insert, group-moving
    upsert, delete) the view equals a FULL recompute over the current
    snapshot, and an independent second incarnation replaying the
    whole change history from scratch lands byte-identical state."""
    import pytest as _pt

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.pointer_store import PointerStore
    from bigquery_etl_spark.streaming.view_stream import (
        start_view_maintenance_from_lake,
    )

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql(
        "CREATE TABLE sv_sales (id INT64, grp STRING, amount FLOAT64)"
    )
    cat.tables["sv_sales"].enable_change_feed(["id"])
    cat.sql(
        "INSERT INTO sv_sales VALUES (1, 'a', 10.0), (2, 'a', 20.0), "
        "(3, 'b', 5.0)"
    )
    cat.sql(
        "CREATE STREAMING MATERIALIZED VIEW sv_mv AS "
        "SELECT grp, SUM(amount) AS total, COUNT(*) AS n "
        "FROM CHANGES(TABLE sv_sales, NULL, NULL) GROUP BY grp"
    )
    got = {
        r.grp: (r.total, r.n)
        for r in cat.sql(
            "SELECT grp, total, n FROM sv_mv ORDER BY grp"
        ).collect()
    }
    assert got == {"a": (30.0, 2), "b": (5.0, 1)}
    # DML through SQL: append + a group-MOVING update + a delete; the
    # view must track retractions, not just inserts
    cat.sql("INSERT INTO sv_sales VALUES (4, 'b', 7.0)")
    cat.sql("UPDATE sv_sales SET grp = 'b', amount = 21.0 WHERE id = 2")
    cat.sql("DELETE FROM sv_sales WHERE id = 1")
    got = {
        r.grp: (r.total, r.n)
        for r in cat.sql(
            "SELECT grp, total, n FROM sv_mv ORDER BY grp"
        ).collect()
    }
    want = {
        r.grp: (r.total, r.n)
        for r in cat.sql(
            "SELECT grp, SUM(amount) AS total, COUNT(*) AS n "
            "FROM sv_sales GROUP BY grp"
        ).collect()
    }
    assert got == want == {"b": (33.0, 3)}
    # full-replay equivalence (C23's bar): a SECOND incarnation
    # replaying the entire change history from version 1 must land
    # IDENTICAL state to the incrementally-maintained view
    q2 = start_view_maintenance_from_lake(
        spark,
        cat.tables["sv_sales"].root,
        str(tmp_path / "replay_view"),
        str(tmp_path / "replay_ckpt"),
        keys=["grp"],
        sums={"total": "amount"},
        count_col="n",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    replay = {
        tuple(r)
        for r in PointerStore(spark, str(tmp_path / "replay_view"))
        .read().select("grp", "total", "n").collect()
    }
    maintained = {
        tuple(r)
        for r in cat.sql("SELECT grp, total, n FROM sv_mv").collect()
    }
    assert replay == maintained
    # refusals: bounded window, non-additive aggregate, WHERE
    with _pt.raises(ValueError, match="unbounded"):
        cat.sql(
            "CREATE STREAMING MATERIALIZED VIEW sv_bad AS "
            "SELECT grp, SUM(amount) AS t FROM CHANGES(TABLE sv_sales, "
            "TIMESTAMP '2020-01-01', TIMESTAMP '2021-01-01') "
            "GROUP BY grp"
        )
    with _pt.raises(ValueError, match="retractable"):
        cat.sql(
            "CREATE STREAMING MATERIALIZED VIEW sv_bad AS "
            "SELECT grp, MAX(amount) AS m "
            "FROM CHANGES(TABLE sv_sales, NULL, NULL) GROUP BY grp"
        )
    cat.sql("DROP STREAMING MATERIALIZED VIEW sv_mv")
    assert "sv_mv" not in cat.streaming_matviews
