"""Streaming dedup: redelivered events within the watermark horizon are
suppressed; the stream's output keys equal the batch dedup's keys."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from data_warehousing_assignment_spark.streaming.dedup import dedup_events
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Two micro-batch files where batch 1 redelivers half of batch 0."""
    d = str(tmp_path_factory.mktemp("sdedup"))
    os.makedirs(f"{d}/stream")
    ev = (
        t(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value", "ts")
        .limit(300)
    )
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter((F.col("event_id") % 2 == 1) | (F.col("event_id") % 4 == 0))
    for i, b in enumerate((b0, b1)):
        b.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        dst = f"{d}/stream/batch_{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() + i * 20, time.time() + i * 20))
    return d, ev


def test_stream_dedup_suppresses_redelivery(spark, staged):
    d, ev = staged
    schema = spark.read.parquet(f"{d}/stream").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = (
        dedup_events(stream, ["event_id"], horizon="100 days")
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly
    out = spark.table("sdedup")
    assert out.count() == ev.count()  # each event exactly once
    batch_keys = {r.event_id for r in dedup_events(ev, ["event_id"]).collect()}
    stream_keys = {r.event_id for r in out.collect()}
    assert stream_keys == batch_keys


def test_batch_path_is_plain_dropduplicates(spark, staged):
    _, ev = staged
    doubled = ev.unionByName(ev)
    out = dedup_events(doubled, ["event_id"])
    assert out.count() == ev.count()
