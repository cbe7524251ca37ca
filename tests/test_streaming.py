"""Structured Streaming correctness contract: the SAME window builders
run as a real file-source ``readStream`` → memory sink (availableNow) and
must agree with their batch execution on the same data (incrementalized
query ≡ batch query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from data_warehousing_assignment_spark.streaming import windows as sw
from tests.conftest import SF_SMALL


def canon(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-materialize sf0.001 events (µs timestamps) as a streamable dir."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    t(spark, SF_SMALL, "events").write.mode("overwrite").parquet(path)
    return path


def run_stream(spark, events_dir, builder):
    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    out = builder(stream)
    name = f"mem_{abs(hash(builder.__name__)) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)  # False = timed out mid-stream: fail loudly
    result = spark.table(name)
    return result, builder(static)


@pytest.mark.parametrize(
    "builder",
    [sw.tumbling_counts, sw.sliding_counts, sw.session_counts],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_equals_batch(spark, events_dir, builder):
    streamed, batch = run_stream(spark, events_dir, builder)
    assert canon(streamed) == canon(batch)


def test_watermark_is_attached_when_streaming(spark, events_dir):
    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    out = sw.tumbling_counts(stream)
    assert out.isStreaming
    # watermark shows up in the analyzed plan
    assert "watermark" in out._jdf.queryExecution().analyzed().toString().lower()
