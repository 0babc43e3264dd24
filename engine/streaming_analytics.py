"""Streaming analytics over the events stream: watermarked windowed
aggregation + a custom stateful operator.

The reference has no streaming surface (SURVEY.md §1.4) but keeps exactly
this kind of state imperatively: the crawler's `hosts` table stores
per-host `lastAccessed` for the politeness throttle
(searchEngine/src/cis5550/crawler/Crawler.java:96,452-477), updated
read-modify-write per URL. Here the same bookkeeping is a Structured
Streaming stateful operator with checkpointed exactly-once state, and the
hourly rollups the reference computes ad hoc become a watermarked windowed
aggregation that handles late events safely.

Scale notes: state is partitioned by the grouping key (user/host) across
executors; the watermark bounds state size (windows older than
max_event_time - delay are finalized and dropped). Both are the standard
Spark answers to unbounded streams — no driver-side maps.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts(spark: SparkSession, source_dir: str,
                          work_dir: str, *, window: str = "1 hour",
                          watermark: str = "30 minutes"):
    """Watermarked tumbling-window rollup of an events file stream.

    Append mode: a (window, event_type) row is emitted exactly once, when
    the watermark passes window end — late events inside the watermark are
    still counted; later ones are dropped (bounded state). Output parquet:
    (window_start, window_end, event_type, n, sum_value)."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
              .withWatermark("ts", watermark))
    agg = (stream.groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n", "sum_value"))
    return (agg.writeStream.format("parquet")
            .option("path", os.path.join(work_dir, "hourly"))
            .option("checkpointLocation", os.path.join(work_dir, "_ckpt_hourly"))
            .outputMode("append").trigger(availableNow=True).start())


_STATE_SCHEMA = "n long, total double, last_ts timestamp"
_OUT_SCHEMA = ("user_id long, n_events long, total_value double, "
               "last_seen timestamp")


def _track_user(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: Any) -> Iterator[pd.DataFrame]:
    """Per-user running totals + last-seen (the `hosts.lastAccessed`
    analog). State survives restarts via the streaming checkpoint —
    exactly-once across waves of input files."""
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None or mx > last_ts else last_ts
    state.update((n, float(total), last_ts))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 2)],
                        "last_seen": [last_ts]})


def user_activity_state(spark: SparkSession, source_dir: str,
                        work_dir: str):
    """Custom stateful operator via applyInPandasWithState: per-user
    cumulative event count / value / last-seen, re-emitted each batch with
    updated state."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    tracked = (stream.select("user_id", "ts", "value")
               .groupBy("user_id")
               .applyInPandasWithState(
                   _track_user, outputStructType=_OUT_SCHEMA,
                   stateStructType=_STATE_SCHEMA, outputMode="append",
                   timeoutConf=GroupStateTimeout.NoTimeout))
    return (tracked.writeStream.format("parquet")
            .option("path", os.path.join(work_dir, "user_state"))
            .option("checkpointLocation", os.path.join(work_dir, "_ckpt_state"))
            .outputMode("append").trigger(availableNow=True).start())


def latest_user_state(spark: SparkSession, work_dir: str) -> DataFrame:
    """Latest emitted state row per user (output parquet is append-only;
    the newest row per user is the current state)."""
    from pyspark.sql import Window
    df = spark.read.parquet(os.path.join(work_dir, "user_state"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("last_seen").desc())
    return (df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
