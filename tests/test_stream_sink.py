"""foreachBatch incremental fact sink: streaming micro-batches with
overlapping/duplicate rows land exactly once, and re-running the whole
stream over the same source is a no-op (idempotent replay)."""

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


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """events split into 2 overlapping micro-batch files: batch 1 repeats
    half of batch 0's rows (simulating at-least-once redelivery)."""
    d = str(tmp_path_factory.mktemp("sink"))
    os.makedirs(f"{d}/stream")
    ev = (
        t(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value", "ts")
        .limit(400)
    )
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(  # half of b0 again + the odd rows
        (F.col("event_id") % 2 == 1) | (F.col("event_id") % 4 == 0)
    )
    for i, b in enumerate((b0, b1)):
        b.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        dst = f"{d}/stream/batch_{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() + i * 20, time.time() + i * 20))
    return d, ev


def run_sink(spark, src_dir, fact_path, checkpoint):
    schema = spark.read.parquet(f"{src_dir}/stream").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/stream")
    )
    q = start_incremental_fact_sink(
        stream, fact_path, checkpoint_dir=checkpoint
    )
    assert q.awaitTermination(180)  # False = timed out mid-stream: fail loudly


def test_overlapping_batches_land_exactly_once(spark, staged, tmp_path):
    d, ev = staged
    fact = str(tmp_path / "fact")
    run_sink(spark, d, fact, str(tmp_path / "ckpt"))
    got = spark.read.parquet(fact)
    assert got.count() == ev.count()  # redelivered rows not duplicated
    assert got.select("event_id").distinct().count() == ev.count()


def test_existing_but_empty_fact_dir_is_first_batch(spark, staged, tmp_path):
    """A fact_path directory that EXISTS but has no committed part-files
    (a first write that died after mkdir) must behave as first-batch, not
    permanently poison the stream with a schema-inference read error."""
    d, ev = staged
    fact = str(tmp_path / "fact3")
    os.makedirs(fact)  # exists, zero committed data
    with open(f"{fact}/_started", "w") as fh:  # stray non-data file too
        fh.write("crashed mid-first-write")
    run_sink(spark, d, fact, str(tmp_path / "ckpt_empty"))
    got = spark.read.parquet(fact)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_full_replay_is_noop(spark, staged, tmp_path):
    d, ev = staged
    fact = str(tmp_path / "fact2")
    run_sink(spark, d, fact, str(tmp_path / "ckpt_a"))
    n1 = spark.read.parquet(fact).count()
    # fresh checkpoint → the source replays from scratch; the anti-join
    # dedup (not the checkpoint) must keep the fact unchanged
    run_sink(spark, d, fact, str(tmp_path / "ckpt_b"))
    assert spark.read.parquet(fact).count() == n1 == ev.count()


def test_orphaned_temporary_partfiles_are_not_committed_data(
    spark, staged, tmp_path
):
    """A first write that crashes mid-task leaves part-* files under
    _temporary/ — paths spark.read.parquet ignores. The committed-data
    probe must ignore them too, or every retry fails schema inference
    against a directory with no visible footers."""
    d, ev = staged
    fact = str(tmp_path / "fact4")
    # fabricate the crash debris: a real-looking part file, but only
    # under _temporary/ (and one under a dot-dir for the '.' rule)
    # real crash debris lives under _temporary/<job>/_temporary/<attempt>/
    # (an UNcommitted task attempt — committed task_* dirs get moved into
    # the root by the next successful job commit, so they aren't debris)
    for hidden in ("_temporary/0/_temporary/attempt_000", ".staging"):
        os.makedirs(f"{fact}/{hidden}")
        with open(f"{fact}/{hidden}/part-00000-dead.snappy.parquet", "wb") as fh:
            fh.write(b"not a parquet footer")
    run_sink(spark, d, fact, str(tmp_path / "ckpt_tmp"))
    got = spark.read.parquet(fact)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_vector_ingest_stream_equals_batch_extend(spark, tmp_path):
    """start_vector_ingest_sink is the streaming twin of
    ivf.extend_ivf_index: micro-batched new vectors (with at-least-once
    redelivery — batch 1 redelivers all of batch 0) land exactly once,
    and the resulting cluster-partitioned assignments table equals the
    batch delta assignment row-for-row."""
    from data_warehousing_assignment_spark.operators import ivf
    from data_warehousing_assignment_spark.streaming.sinks import (
        start_vector_ingest_sink,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    centroids, base_assign = ivf.build_ivf_index(base, n_clusters=16)
    frozen = centroids.localCheckpoint(eager=True)

    d = str(tmp_path)
    os.makedirs(f"{d}/stream")
    b0 = delta.filter(F.col("vec_id") % 20 == 0)
    for i, b in enumerate((b0, delta)):  # delta ⊇ b0: full redelivery
        b.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        dst = f"{d}/stream/batch_{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() + i * 20, time.time() + i * 20))

    schema = spark.read.parquet(f"{d}/stream").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = start_vector_ingest_sink(
        stream, frozen, f"{d}/assign", checkpoint_dir=f"{d}/ckpt"
    )
    assert q.awaitTermination(180)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{d}/assign")
            .select("vec_id", "cluster")
            .collect(),
        )
    )
    _, delta_assign = ivf.extend_ivf_index(
        frozen, base_assign.limit(0), delta
    )
    expect = sorted(
        map(tuple, delta_assign.select("vec_id", "cluster").collect())
    )
    assert got == expect
    assert len(got) == delta.count()
