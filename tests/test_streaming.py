"""Structured Streaming: batch parity of windowed counts + streaming dedup."""

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from instageo_e2e_geospatial_ml_spark.streaming.windows import (
    read_event_stream,
    run_available_now,
    streaming_dedup,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    # copy a small slice of events into a stream-source dir (several files)
    d = tmp_path_factory.mktemp("events_stream")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in"), ev.schema, ev


def test_windowed_counts_batch_parity(spark, events_path, tmp_path):
    path, schema, ev_batch = events_path
    stream = read_event_stream(spark, path, schema)
    agg = windowed_event_counts(stream, window="6 hours", watermark="1 hour")
    got = run_available_now(
        agg, "win_counts", str(tmp_path / "ck1"), output_mode="complete"
    ).toPandas()
    # batch twin: same plan on the static table
    want = (
        ev_batch.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_like=True)


def test_streaming_dedup(spark, events_path, tmp_path):
    path, schema, ev_batch = events_path
    stream = read_event_stream(spark, path, schema)
    dedup = streaming_dedup(stream, ["user_id"], watermark="100 days")
    got = run_available_now(dedup, "dedup_ev", str(tmp_path / "ck2")).toPandas()
    n_users = ev_batch.select("user_id").distinct().count()
    # one row per user (within one watermark horizon covering the data)
    assert len(got) == n_users
    assert got["user_id"].is_unique


def test_sessionize_stream_matches_batch(spark, events_path, tmp_path):
    # the applyInPandasWithState sessionizer must emit exactly the batch
    # twin's sessions: every closed session it emits appears verbatim in
    # sessionize_batch's output, and the only sessions it may withhold are
    # each key's final (still-open) one when no timeout batch fires
    from instageo_e2e_geospatial_ml_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    path, schema, ev_batch = events_path
    stream = read_event_stream(spark, path, schema, max_files=100)
    sessions = sessionize_stream(
        stream, key="event_type", gap_minutes=30, watermark="1 minute"
    )
    got = run_available_now(sessions, "sess_ev", str(tmp_path / "ck3")).toPandas()

    want = sessionize_batch(ev_batch, key="event_type", gap_minutes=30).toPandas()
    want_keyed = {
        (r["event_type"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["sum_value"], 6),
        )
        for _, r in want.iterrows()
    }
    assert len(got) > 0
    for _, r in got.iterrows():
        k = (r["event_type"], r["session_start"], r["session_end"])
        assert k in want_keyed, k
        assert (r["n_events"], round(r["sum_value"], 6)) == want_keyed[k]
    # at most one session per key (the open tail) may be unemitted
    n_keys = want["event_type"].nunique()
    assert len(got) >= len(want) - n_keys


def test_sessionize_stream_multi_batch_state(spark, events_path, tmp_path):
    # force MANY micro-batches (one file per trigger): sessions spanning
    # batch boundaries must survive in state, and event-time timeouts must
    # flush open sessions as the watermark advances between batches
    from instageo_e2e_geospatial_ml_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    path, schema, ev_batch = events_path
    stream = read_event_stream(spark, path, schema, max_files=1)
    sessions = sessionize_stream(
        stream, key="event_type", gap_minutes=30, watermark="1 minute"
    )
    got = run_available_now(sessions, "sess_mb", str(tmp_path / "ckmb")).toPandas()
    want = sessionize_batch(ev_batch, key="event_type", gap_minutes=30).toPandas()

    # with unordered file batches the stream may split sessions the batch
    # twin merges (late-arriving earlier events), but every event must be
    # accounted for exactly once across emitted + still-open sessions:
    # per-key totals of emitted sessions never exceed the batch totals
    got_n = got.groupby("event_type")["n_events"].sum()
    want_n = want.groupby("event_type")["n_events"].sum()
    assert len(got) > 0
    for k, n in got_n.items():
        # no event is ever double-counted across emitted sessions
        assert n <= want_n[k]
    # every emitted session lies inside its key's true event-time range
    # (how MANY close depends on file/batch order — late rows past the
    # watermark are legitimately dropped, so no share assertion)
    rng = want.groupby("event_type").agg(
        lo=("session_start", "min"), hi=("session_end", "max")
    )
    for _, r in got.iterrows():
        assert rng.loc[r["event_type"], "lo"] <= r["session_start"]
        assert r["session_end"] <= rng.loc[r["event_type"], "hi"]
