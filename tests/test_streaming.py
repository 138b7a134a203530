"""Structured Streaming variants equal their batch twins on bounded input."""

from __future__ import annotations

from spark_iceberg_jobs_spark.operators.events import sessionize, tumbling_window_agg
from spark_iceberg_jobs_spark.sources.readers import read_fixture
from spark_iceberg_jobs_spark.streaming.events_stream import (
    run_available_now,
    sessionize_stream,
    stream_events,
    streaming_tumbling_hourly,
    windowed_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in tumbling_window_agg(
            read_fixture(spark, sf_dir, "events"), group_extra=["event_type"]
        ).collect()
    }
    stream = {tuple(r) for r in streaming_tumbling_hourly(spark, sf_dir).collect()}
    assert stream == batch


def test_streaming_watermark_present(spark, sf_dir):
    plan = windowed_counts(stream_events(spark, sf_dir))._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()


def test_stream_stream_join_equals_batch_range_join(spark, sf_dir):
    """Watermarked stream-stream interval join on bounded input == the batch
    banded_range_join with mirrored bounds."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.operators.joins import banded_range_join
    from spark_iceberg_jobs_spark.streaming.events_stream import (
        stream_stream_purchase_click_join,
    )

    streamed = run_available_now(
        stream_stream_purchase_click_join(stream_events(spark, sf_dir), max_gap_sec=3600),
        query_name="ss_join",
        output_mode="append",
    )
    got = {(r.purchase_id, r.click_id) for r in streamed.collect()}

    ev = read_fixture(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), us.alias("c_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), us.alias("p_us")
    )
    # batch mirror: click in [purchase - 1h, purchase)
    batch = {
        (r.purchase_id, r.click_id)
        for r in banded_range_join(
            clicks.withColumnRenamed("c_us", "left_us"),
            purchases.withColumnRenamed("p_us", "right_us"),
            on="user_id",
            left_es="left_us",
            right_es="right_us",
            max_gap_sec=3600 * 1_000_000,  # µs domain
        ).collect()
    }
    assert got == batch
    assert got, "fixture should contain click→purchase sequences"


def test_foreach_batch_upsert_sink(spark, sf_dir, tmp_path):
    """Streaming foreachBatch MERGE into a parquet target: final table has
    one row per user with their latest running aggregate."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.streaming.events_stream import foreach_batch_upsert_sink

    target = str(tmp_path / "user_totals")
    agg = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    foreach_batch_upsert_sink(agg, target_path=target, key="user_id")
    back = spark.read.parquet(target)
    ev = read_fixture(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert {(r.user_id, r.n, r.total) for r in back.collect()} == expected


def test_upsert_sink_recovers_orphaned_aside_dir(spark, sf_dir, tmp_path):
    """ADVICE r1 (medium): a crash between rename(target→__prev) and
    rename(tmp→target) leaves the history ONLY in __prev. The sink must
    restore it — not silently rebuild the table from one micro-batch. A
    sentinel user that exists only in the orphaned history must survive."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.streaming.events_stream import foreach_batch_upsert_sink

    target = str(tmp_path / "user_totals")
    # simulate the crash state: history landed in __prev, no target dir
    history = spark.createDataFrame(
        [(999_999, 7, 1.25)], "user_id long, n long, total double"
    )
    history.write.parquet(target + "__prev")
    agg = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    foreach_batch_upsert_sink(agg, target_path=target, key="user_id")
    back = {r.user_id: (r.n, r.total) for r in spark.read.parquet(target).collect()}
    assert back[999_999] == (7, 1.25), "orphaned history must be restored, not lost"
    import os

    assert not os.path.exists(target + "__prev"), "aside dir must be consumed"


def test_streaming_dedup_restores_exactly_once(spark, sf_dir):
    """Every event is delivered twice (self-union); the watermarked dedup
    state must restore the exact original event set — same count (not 2x),
    same event_ids."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.sources.readers import read_fixture
    from spark_iceberg_jobs_spark.streaming.events_stream import (
        streaming_dedup_redelivery,
    )

    deduped = streaming_dedup_redelivery(spark, sf_dir)
    batch = read_fixture(spark, sf_dir, "events")
    assert deduped.count() == batch.count()
    assert deduped.select("event_id").distinct().count() == deduped.count()
    missing = batch.select("event_id").exceptAll(deduped.select("event_id")).count()
    assert missing == 0


def test_sessionize_stream_emits_closed_sessions(spark, sf_dir):
    """applyInPandasWithState sessionization: every *closed* session the
    stream emits must exist in the batch sessionization with identical
    aggregates (the stream can't see past the end of input, so open
    sessions stay in state and are not emitted)."""
    events = read_fixture(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.n_events, r.session_value)
        for r in sessionize(events, gap_sec=1800).collect()
    }
    emitted = run_available_now(
        sessionize_stream(stream_events(spark, sf_dir), gap_sec=1800),
        query_name="sess_test",
        output_mode="append",
    ).collect()
    assert emitted, "bounded fixture should close at least one session"
    for r in emitted:
        assert (r.user_id, r.n_events, r.session_value) in batch


def test_rocksdb_state_store_and_checkpoint_resumption(spark, sf_dir, tmp_path):
    """Production streaming config end-to-end: the RocksDB state store
    provider backs the windowed aggregation, and a restart from the same
    checkpoint reprocesses ZERO input rows (the source offsets are
    committed — exactly-once resumption, not a re-read)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        agg = windowed_counts(stream_events(spark, sf_dir))
        ck = str(tmp_path / "ck")

        def run(name):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return (q.lastProgress or {}).get("numInputRows", 0)

        first_in = run("rocks_first")
        assert first_in > 0
        assert spark.table("rocks_first").count() > 0
        restart_in = run("rocks_restart")
        assert restart_in == 0, "checkpointed restart must not reprocess the source"
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_transform_with_state_env_probe(spark, sf_dir):
    """transformWithStateInPandas (the Spark 4 declared-state API): its
    Python<->JVM state protocol imports google.protobuf, which this
    container lacks — probe and skip loudly (same policy as the Iceberg
    runtime probe). When the dependency ships, this test drives the
    user_totals_tws operator end-to-end and asserts it equals the batch
    per-user aggregate (its registered oracle's claim)."""
    import importlib.util

    import pytest

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        has_protobuf = False
    if not has_protobuf:
        pytest.skip(
            "google.protobuf not installed — transformWithStateInPandas's "
            "state server protocol is environment-blocked; operator "
            "user_totals_tws + TWS_TOTALS_ORACLE are ready "
            "(queries/events.py registry note)"
        )
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.queries.events import streaming_tws_user_totals
    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    got = streaming_tws_user_totals(spark, sf_dir).collect()
    ev = read_fixture(spark, sf_dir, "events")
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("value").alias("max_value"),
            F.unix_timestamp(F.min("ts")).alias("first_es"),
            F.unix_timestamp(F.max("ts")).alias("last_es"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_upsert_sink_checkpoint_resumes_without_replaying_batches(spark, tmp_path):
    """VERDICT r8 item 5: the checkpoint_dir parameter (landed r8,
    untested) must give restart-resume semantics — a second run with the
    SAME checkpoint processes only files that arrived since the first
    run, never re-applying an already-merged batch. Pinned by a sentinel:
    after run 1 the target's key-1 row is mutated out-of-band; run 2 (new
    file touching keys 2,3 only) must leave the mutation intact — a
    replayed batch 1 would overwrite it. The no-checkpoint contrast run
    shows exactly that replay, which is why production callers must pass
    a stable dir."""
    import os

    from spark_iceberg_jobs_spark.streaming.events_stream import (
        foreach_batch_upsert_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name: str, rows: list[tuple[int, int]]) -> None:
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.parquet(
            str(tmp_path / "stage" / name)
        )
        part = next(
            p
            for p in os.listdir(tmp_path / "stage" / name)
            if p.endswith(".parquet")
        )
        os.rename(tmp_path / "stage" / name / part, src / f"{name}.parquet")

    def run() -> None:
        stream = spark.readStream.schema("k long, v long").parquet(str(src))
        foreach_batch_upsert_sink(
            stream, target_path=target, key="k", checkpoint_dir=ckpt
        )

    def table() -> dict[int, int]:
        return {r.k: r.v for r in spark.read.parquet(target).collect()}

    write_file("a", [(1, 1), (2, 1)])
    run()
    assert table() == {1: 1, 2: 1}

    # out-of-band mutation: survives iff batch A is never re-applied
    mutated = spark.createDataFrame([(1, 99), (2, 1)], "k long, v long")
    mutated.write.mode("overwrite").parquet(target)

    write_file("b", [(2, 2), (3, 2)])
    run()
    assert table() == {1: 99, 2: 2, 3: 2}, (
        "restart must resume from the checkpointed offset: key 1's "
        "out-of-band value proves batch A was not replayed"
    )

    # third restart with no new input: a no-op
    run()
    assert table() == {1: 99, 2: 2, 3: 2}

    # CONTRAST: no checkpoint_dir -> throwaway checkpoint -> full replay
    # (batch A re-merged, key 1 reverts) — the failure mode the
    # parameter exists to prevent
    stream = spark.readStream.schema("k long, v long").parquet(str(src))
    foreach_batch_upsert_sink(stream, target_path=target, key="k")
    assert table()[1] == 1, "without a checkpoint every file is reprocessed"


def test_session_updater_zero_chunk_invocation_preserves_state():
    """ADVICE r8: a state-only invocation (zero Arrow chunks — what an
    EventTimeTimeout config delivers on a group timeout) must re-persist
    the open session unchanged, not crash pd.concat. Drives the updater
    directly via the module-level factory — no streaming orchestration
    needed. Also pins the fold itself: cross-chunk global sort and the
    integer-cent exact accumulation."""
    import pandas as pd

    from spark_iceberg_jobs_spark.streaming.events_stream import make_session_updater

    class FakeState:
        def __init__(self, value=None):
            self._v = value
            self.updated = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v
            self._v = v

    update = make_session_updater(gap_sec=100)

    # zero chunks, open session in state: no output, state re-persisted
    st = FakeState((1000, 1010, 2, 350))
    out = list(update((7,), iter(()), st))
    assert len(out) == 1 and out[0].empty
    assert st.updated == (1000, 1010, 2, 350)

    # zero chunks, NO state: no output, nothing persisted
    st2 = FakeState()
    out2 = list(update((7,), iter(()), st2))
    assert out2[0].empty and st2.updated is None

    # two chunks arriving out of order: the later chunk carries the
    # EARLIER timestamps — the global sort must interleave them before
    # folding (the r8 per-chunk-sort bug); 0.1+0.2 accumulates in exact
    # cents (30), not binary floats (0.30000000000000004)
    c1 = pd.DataFrame({"es": [1500], "value": [0.2]})
    c2 = pd.DataFrame({"es": [1120, 1300], "value": [0.1, 5.0]})
    st3 = FakeState((1000, 1010, 2, 350))
    out3 = list(update((7,), iter((c1, c2)), st3))
    # 1120 - 1010 > 100 closes the open session (3.50); 1300/1500 chain
    # onto the new one (gaps 180/200 > 100 -> each closes the previous)
    rows = [tuple(r) for r in out3[0].itertuples(index=False)]
    assert rows == [(7, 1000, 2, 3.5), (7, 1120, 1, 0.1), (7, 1300, 1, 5.0)]
    assert st3.updated == (1500, 1500, 1, 20)


def test_windowed_aggregation_state_survives_restart(spark, tmp_path):
    """Streaming STATE recovery across restarts (the companion to the
    upsert-sink offset test): a windowed count runs with a checkpoint,
    stops, new files arrive, and the restarted query folds the new
    events into the RESTORED window state. Batch ids prove the second
    run resumed the offset log (it starts at batch 1, not 0) — so the
    window reaching 3 can only come from restored state plus the one new
    event, never from a replay of the first file."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.parquet(
            str(tmp_path / "stage" / name)
        )
        part = next(
            p for p in os.listdir(tmp_path / "stage" / name) if p.endswith(".parquet")
        )
        os.rename(tmp_path / "stage" / name / part, src / f"{name}.parquet")

    def run():
        captured = []

        def cap(df, bid):
            captured.append((bid, {r.ws: r.n for r in df.collect()}))

        agg = (
            spark.readStream.schema("ts timestamp, v long")
            .parquet(str(src))
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.foreachBatch(cap)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return captured

    t = dt.datetime
    w1, w2 = t(2024, 1, 1, 10, 0), t(2024, 1, 1, 11, 0)
    write_file("a", [(t(2024, 1, 1, 10, 5), 1), (t(2024, 1, 1, 10, 20), 1)])
    run1 = run()
    assert run1[-1][1] == {w1: 2}
    assert run1[0][0] == 0, "first run starts at batch 0"

    write_file("b", [(t(2024, 1, 1, 10, 40), 1), (t(2024, 1, 1, 11, 10), 1)])
    run2 = run()
    assert run2[0][0] >= 1, "restart must resume the offset log, not replay"
    assert run2[-1][1] == {w1: 3, w2: 1}, (
        "restored window state (2) must fold the one new in-window event"
    )
