"""Watermarked windowed aggregation + applyInPandasWithState operator:
two waves of event files; emitted windows must match a batch groupBy of
the same data exactly, and per-user state must accumulate across separate
stream restarts (checkpointed exactly-once state)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.streaming_analytics import (
    latest_user_state,
    user_activity_state,
    windowed_event_counts,
)


def _mk_events(spark, start_hour: int, n: int, base_id: int):
    rows = []
    for i in range(n):
        ts = (pd.Timestamp("2024-01-01") + pd.Timedelta(
            hours=start_hour, minutes=(i * 7) % 60)).to_pydatetime()
        rows.append((base_id + i, ts, (base_id + i) % 5,
                     ["click", "view"][i % 2], float(i), "{}"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_watermark_windowed_counts(spark, tmp_path):
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    os.makedirs(src)

    # wave 1: hours 0-1; wave 2: hour 5 (advances watermark past wave 1)
    _mk_events(spark, 0, 40, 0).coalesce(1).write.mode("append").parquet(src)
    _mk_events(spark, 1, 40, 100).coalesce(1).write.mode("append").parquet(src)
    q = windowed_event_counts(spark, src, work)
    q.awaitTermination(300)
    _mk_events(spark, 5, 20, 200).coalesce(1).write.mode("append").parquet(src)
    q = windowed_event_counts(spark, src, work)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(work, "hourly"))
    rows = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in got.collect()}
    assert rows, "watermark never emitted any finalized window"

    # every emitted row must equal the batch rollup of the same window
    batch = (spark.read.parquet(src)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
    want = {(r["w"]["start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in batch.collect()}
    for k, v in rows.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    # hours 0 and 1 are closed by the hour-5 watermark -> must be emitted
    emitted_hours = {k[0].hour for k in rows}
    assert {0, 1} <= emitted_hours


def test_stateful_user_tracking_across_restarts(spark, tmp_path):
    src, work = str(tmp_path / "src2"), str(tmp_path / "work2")
    os.makedirs(src)

    _mk_events(spark, 0, 30, 0).coalesce(1).write.mode("append").parquet(src)
    q = user_activity_state(spark, src, work)
    q.awaitTermination(300)
    _mk_events(spark, 2, 30, 500).coalesce(1).write.mode("append").parquet(src)
    q = user_activity_state(spark, src, work)  # restart from checkpoint
    q.awaitTermination(300)

    latest = {r["user_id"]: (r["n_events"], r["total_value"])
              for r in latest_user_state(spark, work).collect()}
    batch = {r["user_id"]: (r["n"], r["tv"]) for r in
             spark.read.parquet(src).groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 2).alias("tv")).collect()}
    assert latest == batch  # state accumulated across the restart
