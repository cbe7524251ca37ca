"""Stream-stream interval join: streamed result ≡ batch range join on
the same data (the Structured Streaming correctness contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from data_warehousing_assignment_spark.streaming.joins import (
    view_purchase_conversions,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ssj"))
    t(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).write.mode("overwrite").parquet(path)
    return path


def canon(df):
    return sorted(map(tuple, df.collect()))


def test_stream_stream_join_equals_batch(spark, events_dir):
    static = spark.read.parquet(events_dir)
    sviews = static.filter(F.col("event_type") == "view")
    spurch = static.filter(F.col("event_type") == "purchase")

    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    vstream = stream.filter(F.col("event_type") == "view")
    pstream = stream.filter(F.col("event_type") == "purchase")

    out = view_purchase_conversions(vstream, pstream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly

    batch = view_purchase_conversions(sviews, spurch)
    assert canon(spark.table("ssjoin")) == canon(batch)
    assert batch.count() > 0  # non-degenerate fixture


def test_interval_bounds_respected(spark, events_dir):
    static = spark.read.parquet(events_dir)
    out = view_purchase_conversions(
        static.filter(F.col("event_type") == "view"),
        static.filter(F.col("event_type") == "purchase"),
        horizon="1 hour",
    ).collect()
    for r in out:
        assert 0 <= r.delay_sec <= 3600


def test_outer_join_batch_covers_every_view(spark, events_dir):
    from data_warehousing_assignment_spark.streaming.joins import (
        view_conversion_outcomes,
    )

    static = spark.read.parquet(events_dir)
    views = static.filter(F.col("event_type") == "view")
    purch = static.filter(F.col("event_type") == "purchase")
    out = view_conversion_outcomes(views, purch)
    # every view appears; non-converting views carry NULL purchase cols
    assert out.select("view_id").distinct().count() == views.count()
    matched = out.filter(F.col("purchase_id").isNotNull())
    inner = view_purchase_conversions(views, purch)
    assert matched.count() == inner.count()
    assert out.filter(F.col("purchase_id").isNull()).count() > 0


def test_outer_join_streams_matched_rows(spark, events_dir):
    """Streaming left-outer interval join: append-mode accepted, and the
    matched rows it emits equal the batch inner join. NULL-padded rows
    trail the final watermark (a finite availableNow run never advances
    past the last event), so only the matched subset is asserted."""
    from data_warehousing_assignment_spark.streaming.joins import (
        view_conversion_outcomes,
    )

    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    out = view_conversion_outcomes(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly
    got = spark.table("ssjoin_outer")
    batch_inner = view_purchase_conversions(
        static.filter(F.col("event_type") == "view"),
        static.filter(F.col("event_type") == "purchase"),
    )
    assert canon(got.filter(F.col("purchase_id").isNotNull()).select(
        "view_id", "purchase_id", "user_id", "purchase_value", "delay_sec"
    )) == canon(batch_inner.select(
        "view_id", "purchase_id", "user_id", "purchase_value", "delay_sec"
    ))


def test_stream_static_enrich_equals_batch(spark, events_dir):
    """Stream-static dim join: streamed enrichment ≡ the same join on
    static frames (and needs no watermark — state-free by design)."""
    from data_warehousing_assignment_spark.streaming.joins import (
        enrich_with_dim,
    )

    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    static = spark.read.parquet(events_dir).select(
        "event_id", "user_id", "value"
    )
    cond = F.col("user_id") % 25 == F.col("n_nationkey")

    stream = (
        spark.readStream.schema(
            spark.read.parquet(events_dir).schema
        )
        .parquet(events_dir)
        .select("event_id", "user_id", "value")
    )
    out = enrich_with_dim(stream, nation, cond, ["n_name"])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssenrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly

    batch = enrich_with_dim(static, nation, cond, ["n_name"])
    assert canon(spark.table("ssenrich")) == canon(batch)
    assert batch.count() > 0
