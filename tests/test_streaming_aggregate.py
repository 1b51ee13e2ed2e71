"""Streaming windowed aggregation (watermark) + stateful sessionization
(applyInPandasWithState) — availableNow runs over the static events table,
checked against batch recomputations of the same semantics."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.streaming.aggregate import (
    stream_events_hourly,
    stream_sessionize,
)

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.spark


@pytest.fixture()
def events_stream_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def _run_available_now(spark, stream_df, sink: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


def test_stream_hourly_matches_batch_up_to_watermark(spark, events_stream_dir, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    got = _run_available_now(
        spark,
        stream_events_hourly(stream, late_threshold="0 seconds"),
        "hourly_sink",
        str(tmp_path / "ck1"),
    ).collect()

    # batch equivalent, restricted to windows closed by the final watermark
    # (= max event time at threshold 0): append mode can only have emitted
    # windows whose END <= watermark
    max_ts = events.agg(F.max("ts")).first()[0]
    want = {
        (r["event_type"], r["hour_bucket"]): (r["n_events"], r["sum_value"])
        for r in (
            events.groupBy(
                "event_type", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour_bucket")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
            )
            .where(
                F.to_timestamp(F.concat(F.col("hour_bucket"), F.lit(":00:00")), "yyyy-MM-dd HH:mm:ss")
                + F.expr("interval 1 hour")
                <= F.lit(max_ts)
            )
            .collect()
        )
    }
    got_map = {
        (r["event_type"], r["hour_bucket"]): (r["n_events"], r["sum_value"])
        for r in got
    }
    assert got_map == want
    assert len(got_map) > 50  # non-trivial window count actually emitted


def test_stream_sessionize_closed_sessions_match_pandas(spark, events_stream_dir, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    # timeout disabled: closed sessions only — deterministic regardless of
    # wall time (the timeout flush path is unit-tested below)
    got = _run_available_now(
        spark, stream_sessionize(stream, timeout_ms=None), "sess_sink", str(tmp_path / "ck2")
    ).collect()

    # pandas reference: per-user 30-min-gap sessions; ONLY closed sessions
    # (append mode leaves each user's trailing session in state)
    pdf = events.select("user_id", "ts").toPandas()
    want = set()
    for uid, grp in pdf.groupby("user_id"):
        ts = sorted(grp["ts"].astype("datetime64[us]").tolist())
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - last).total_seconds() * 1e6 > 1_800_000_000:
                want.add((uid, start, last, n))
                start, n = t, 0
            n += 1
            last = t
        # trailing open session NOT expected in append output
    got_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    assert got_set == want
    assert len(got_set) > 100  # the sf0.01 events table closes many sessions


def test_sessionize_timeout_flushes_open_session():
    """Unit test of the timed-out branch: a stub GroupState with an open
    session must be flushed as one session row and removed."""
    from geojson_vt_cpp_spark.streaming.aggregate import make_sessionizer

    class StubState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = True
            self.removed = False

        @property
        def exists(self):
            return self._v is not None and not self.removed

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    kern = make_sessionizer(timeout_ms=1000)
    start, last = 1_700_000_000_000_000, 1_700_000_900_000_000
    state = StubState((start, last, 7))
    out = list(kern((42,), iter(()), state))
    assert state.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_events"]) == (42, 7)
    assert row["session_start"] == pd.Timestamp(start, unit="us")
    assert row["session_end"] == pd.Timestamp(last, unit="us")

    # empty state times out -> nothing emitted
    empty = StubState(None)
    assert list(kern((43,), iter(()), empty)) == []
