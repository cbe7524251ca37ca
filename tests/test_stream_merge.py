"""Streaming MERGE INTO maintenance: micro-batched CDC through
``start_merge_sink`` must equal the batch merge_into replay — stream ≡
batch — including deletes and in-batch multi-change collapse."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans.kimball import merge_into
from data_warehousing_assignment_spark.streaming.sinks import start_merge_sink

KEY, ATTRS = "k", ["v"]
SCHEMA = "k INT, v INT, op STRING, seq INT"

BATCHES = [
    [(1, 10, "I", 1), (2, 20, "I", 2)],
    # in-batch multi-change: k=1 updated twice — seq 5 wins;
    # k=2 deleted; k=3 inserted
    [(1, 11, "U", 4), (1, 12, "U", 5), (2, 20, "D", 3), (3, 30, "I", 6)],
    # delete a missing key (ignored), re-insert k=2
    [(9, 0, "D", 7), (2, 25, "I", 8)],
]


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mergestream"))
    os.makedirs(f"{d}/stream")
    for i, rows in enumerate(BATCHES):
        df = spark.createDataFrame(
            [Row(k=a, v=b, op=o, seq=s) for a, b, o, s in rows], SCHEMA
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        dst = f"{d}/stream/batch_{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() + i * 20, time.time() + i * 20))
    return d


def _batch_replay(spark):
    target = None
    for rows in BATCHES:
        df = spark.createDataFrame(
            [Row(k=a, v=b, op=o, seq=s) for a, b, o, s in rows], SCHEMA
        )
        from pyspark.sql import Window

        latest = (
            df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(KEY).orderBy(F.desc("seq"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if target is None:
            target = latest.select(KEY, *ATTRS).limit(0)
        target = merge_into(
            target, latest.select(KEY, *ATTRS, "op"), KEY, ATTRS
        ).localCheckpoint(eager=False)
    return target


def test_stream_merge_equals_batch_replay(spark, staged, tmp_path):
    target_path = str(tmp_path / "tgt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staged}/stream")
    )
    q = start_merge_sink(
        stream, target_path, KEY, ATTRS, "seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly

    got = sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(target_path).collect()
    )
    want = sorted(
        (r["k"], r["v"]) for r in _batch_replay(spark).collect()
    )
    assert got == want
    # semantic spot-checks: k=1 took the later in-batch update; k=2
    # survived delete-then-reinsert; the unmatched delete left no row
    assert dict(got) == {1: 12, 2: 25, 3: 30}
