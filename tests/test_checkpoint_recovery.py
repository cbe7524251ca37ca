"""Checkpoint recovery: a stopped stream restarted with the SAME
checkpoint resumes where it left off (only new files read), and the fact
contents stay exactly-once across the restart."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from data_warehousing_assignment_spark.streaming.sinks import (
    start_incremental_fact_sink,
)
from tests.conftest import SF_SMALL


def stage_file(df, stage_dir: str, name: str, mtime_off: float) -> None:
    tmp = f"{stage_dir}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = f"{stage_dir}/{name}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (time.time() + mtime_off, time.time() + mtime_off))


def run_once(spark, src_dir, fact, ckpt):
    schema = "event_id bigint, user_id bigint, value double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = start_incremental_fact_sink(stream, fact, checkpoint_dir=ckpt)
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly
    return sum(p["numInputRows"] for p in q.recentProgress)


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    ev = (
        t(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value")
        .limit(300)
    )
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    os.makedirs(src)
    fact = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: only batch 0 exists; stream drains it and stops
    stage_file(b0, src, "batch_0", 0)
    read1 = run_once(spark, src, fact, ckpt)
    assert read1 == b0.count()
    assert spark.read.parquet(fact).count() == b0.count()

    # phase 2: add batch 1, restart with the SAME checkpoint —
    # only the new file is read (checkpoint skips batch 0 entirely)
    stage_file(b1, src, "batch_1", 30)
    read2 = run_once(spark, src, fact, ckpt)
    assert read2 == b1.count()

    got = spark.read.parquet(fact)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
