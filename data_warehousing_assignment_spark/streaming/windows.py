"""Event-time windowed aggregations, written once for batch AND
Structured Streaming.

Each builder takes a DataFrame that may be a static frame (testdata
events.parquet) or a ``readStream`` frame — the transformations are
identical; only the sink differs (batch: collect/write; streaming:
``writeStream`` with a mode). ``tests/test_streaming.py`` runs the same
builders through a real file-source ``readStream`` → memory sink and
asserts batch/stream agreement, which is the Structured Streaming
correctness contract (incrementalized query ≡ batch query on the same
data).

Scale notes: event-time windows aggregate with map-side partials keyed
by (window, group); the watermark bounds state so long-running streams
don't grow without bound (late rows beyond the watermark are dropped —
the late-data policy the reference never had)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import dec


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "15 minutes") -> DataFrame:
    """Attach an event-time watermark when streaming; no-op on batch
    frames (watermarks only affect stateful incremental execution)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window: per (window, group) count + exact
    decimal sum. Output window start as a string for engine-neutral
    comparison."""
    w = F.window(ts_col, window_len)
    return (
        with_watermark(df, ts_col)
        .groupBy(w.alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time window (each event lands in window_len/slide
    overlapping windows)."""
    w = F.window(ts_col, window_len, slide)
    return (
        with_watermark(df, ts_col)
        .groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by ≥`gap` of
    silence (F.session_window — dynamic-length stateful windows; in
    streaming mode state merges sessions across micro-batches)."""
    w = F.session_window(ts_col, gap)
    return (
        with_watermark(df, ts_col)
        .groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )
