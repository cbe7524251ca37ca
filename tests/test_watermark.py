"""Watermark late-data policy: in append mode a window emits once the
watermark passes its end, and events arriving after that are dropped
(visible in numRowsDroppedByWatermark) — the late-data contract the
reference never had (it reprocessed everything every run).

Semantics nuance this test pins: the watermark used in batch N derives
from data seen through batch N-1, so a late row is only dropped once its
window has already been finalized in an EARLIER batch — hence the
three-batch replay (seed → advance+emit → late arrival)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

import pytest

from data_warehousing_assignment_spark.streaming.windows import tumbling_counts

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


BATCHES = [
    # batch 0: two hour-0 events + an hour-2 event (sets wm to 2:35)
    [(1, "click", 1.0, ts(0)), (2, "click", 1.0, ts(10)), (3, "click", 1.0, ts(170))],
    # batch 1: hour-3 event → runs with wm 2:35 → hour-0 window EMITS
    [(5, "click", 1.0, ts(190))],
    # batch 2: late hour-0 event (0:20 << wm 2:55) → must be dropped
    [(4, "click", 99.0, ts(20))],
]
SCHEMA = "event_id long, event_type string, value double, ts timestamp"


@pytest.fixture(scope="module")
def staged_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wm"))
    os.makedirs(f"{d}/stream")
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b{i}")
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        dst = f"{d}/stream/batch_{i}.parquet"
        shutil.copy(src, dst)
        # strictly increasing mtimes pin the replay order
        os.utime(dst, (time.time() + i * 20, time.time() + i * 20))
    return f"{d}/stream"


def test_append_mode_drops_late_rows(spark, staged_dir):
    static = spark.read.parquet(staged_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("wm_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly

    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the late 99.0 event

    rows = {r.window_start: r for r in spark.table("wm_windows").collect()}
    h0 = rows.get("2024-01-01 00:00:00")
    assert h0 is not None, f"hour-0 window never finalized: {list(rows)}"
    assert h0.n_events == 2
    assert h0.total_value == pytest.approx(2.0)  # late 99.0 never counted

    # batch-mode on the same files DOES count the late row — the delta
    # IS the watermark policy
    batch = {r.window_start: r for r in tumbling_counts(static).collect()}
    assert batch["2024-01-01 00:00:00"].n_events == 3
    assert batch["2024-01-01 00:00:00"].total_value == pytest.approx(101.0)
