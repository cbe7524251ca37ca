"""Streaming CEP (streaming/cep.py): the 2-state DFA must count exactly
what leftmost non-overlapping regex matching of v[cs]*p counts, and the
micro-batch replay must converge to the batch final state."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from data_warehousing_assignment_spark.streaming.cep import (
    advance_dfa,
    conversion_cep,
)
from tests.conftest import SF_SMALL


def _regex_count(s: str) -> int:
    return len(re.findall("v[cs]*p", s))


def test_dfa_equals_regex_on_crafted_strings():
    for s in (
        "", "v", "p", "vp", "vcp", "vcsp", "vcscp",
        "vvp",          # re-arm: second v restarts, still one match
        "vev p".replace(" ", ""),  # error breaks the armed run
        "vpvp",         # two non-overlapping conversions
        "vcpcp",        # second p finds no armed match
        "pvcsve",       # never completes
        "vcsvp",        # inner v re-arms then completes: one match
    ):
        armed, n = advance_dfa(0, 0, list(s))
        assert n == _regex_count(s), s


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="vcspe", max_size=60))
    def test_dfa_equals_regex_property(s):
        _, n = advance_dfa(0, 0, list(s))
        assert n == _regex_count(s)

    @settings(max_examples=100, deadline=None)
    @given(
        st.text(alphabet="vcspe", max_size=40),
        st.integers(0, 40),
    )
    def test_dfa_is_splittable(s, cut):
        """State carried across an arbitrary split must equal one pass —
        the property that makes the operator streamable."""
        cut = min(cut, len(s))
        armed, n = advance_dfa(0, 0, list(s[:cut]))
        armed, n = advance_dfa(armed, n, list(s[cut:]))
        assert n == _regex_count(s)
except ImportError:  # pragma: no cover
    pass


@pytest.fixture(scope="module")
def cep_chunks(spark, tmp_path_factory):
    """events split into 3 TIME-RANGE files, written sequentially so the
    file source's modification-time ordering replays them as in-order
    micro-batches (the operator's ordering contract)."""
    import time

    path = str(tmp_path_factory.mktemp("cep_chunks"))
    ev = (
        t(spark, SF_SMALL, "events")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .select("user_id", "event_type", "ts_us", "event_id")
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    step = (hi - lo) // 3 + 1
    for i in range(3):
        ev.filter(
            (F.col("ts_us") >= lo + i * step)
            & (F.col("ts_us") < lo + (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)  # distinct mtimes → deterministic replay order
    return path


def test_stream_cep_converges_to_batch(spark, cep_chunks):
    static = spark.read.parquet(cep_chunks)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cep_chunks)
    )
    q = (
        conversion_cep(stream)
        .writeStream.format("memory")
        .queryName("cep_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)  # False = still running: fail loudly
    emitted = spark.sql(
        """SELECT user_id, n_conversions FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY n_events DESC) AS rn
             FROM cep_out) WHERE rn = 1"""
    )
    want = {
        r["user_id"]: r["n_conversions"]
        for r in conversion_cep(static).collect()
    }
    got = {r["user_id"]: r["n_conversions"] for r in emitted.collect()}
    assert got == want


def test_cep_skips_null_and_empty_event_types(spark):
    """One dirty row (NULL or '' event_type) must be skipped, exactly
    like the regex twin's string_agg/array_join NULL-drop — the
    pre-fix handler crashed the Python worker (r8 review)."""
    rows = [
        (1, "view", 1, 1),
        (1, None, 2, 2),
        (1, "", 3, 3),
        (1, "purchase", 4, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_type: string, ts_us: long, event_id: long"
    )
    out = {r["user_id"]: r for r in conversion_cep(df).collect()}
    assert out[1]["n_conversions"] == 1  # 'v' then 'p', dirt skipped
    assert out[1]["n_events"] == 4      # raw rows still counted


def test_cep_counts_out_of_order_cross_batch_events(spark, tmp_path):
    """An event delivered in a LATER micro-batch with an EARLIER ts_us
    than anything already consumed must increment n_late — the ordering
    contract made observable instead of silently corrupting
    n_conversions (r8 review). In-order replay stays n_late = 0."""
    import time

    path = str(tmp_path / "ooo")
    schema = "user_id: long, event_type: string, ts_us: long, event_id: long"
    # batch 1: view@10, click@20  — high-watermark 20
    spark.createDataFrame(
        [(1, "view", 10, 1), (1, "click", 20, 2)], schema
    ).coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)
    # batch 2: purchase@15 (LATE: below watermark 20), view@30
    spark.createDataFrame(
        [(1, "purchase", 15, 3), (1, "view", 30, 4)], schema
    ).coalesce(1).write.mode("append").parquet(path)

    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        conversion_cep(stream)
        .writeStream.format("memory")
        .queryName("cep_ooo")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    final = spark.sql(
        """SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY n_events DESC) AS rn
             FROM cep_ooo) WHERE rn = 1"""
    ).collect()[0]
    assert final["n_late"] == 1   # the purchase@15 below watermark 20
    assert final["n_events"] == 4
    # batch twin on the union is fully sorted: zero late by definition
    b = conversion_cep(static).collect()[0]
    assert b["n_late"] == 0
