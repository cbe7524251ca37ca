"""Transaction-log mechanics (plans/txlog.py): snapshot isolation by
version pin, manifest-only file resolution, compaction rewrites, and
vacuum retention — the Delta-faithful life cycle on plain parquet."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from data_warehousing_assignment_spark.plans import txlog


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for v in (1, 2, 3):
        df = spark.createDataFrame(
            [Row(k=i, ver=v) for i in range(v * 2)]
        )
        txlog.commit(root, df, v)
    return root


def test_snapshot_pins_exclude_later_commits(spark, table):
    v1 = txlog.read_snapshot(spark, table, as_of_version=1)
    v2 = txlog.read_snapshot(spark, table, as_of_version=2)
    latest = txlog.read_snapshot(spark, table)
    assert v1.count() == 2
    assert v2.count() == 2 + 4
    assert latest.count() == 2 + 4 + 6
    assert {r.ver for r in v2.collect()} == {1, 2}


def test_append_only_log_has_nothing_to_vacuum(spark, table):
    """Every delta is referenced by all later snapshots until a rewrite
    commit supersedes it — vacuum on an append-only log deletes
    NOTHING (deleting v1's delta would corrupt v2 and v3 too)."""
    assert txlog.vacuum(table, retain_from_version=3) == []
    assert txlog.read_snapshot(spark, table).count() == 12


def test_compact_then_vacuum_bounds_time_travel(spark, table):
    compacted = txlog.compact(spark, table, version=4)
    # compaction preserves content exactly
    assert txlog.read_snapshot(spark, table).count() == 12
    assert txlog.read_snapshot(spark, table, as_of_version=4).count() == 12
    # pre-compaction snapshots still resolve the old files
    assert txlog.read_snapshot(spark, table, as_of_version=2).count() == 6

    removed = txlog.vacuum(table, retain_from_version=4)
    assert len(removed) == 3  # the three superseded delta dirs
    assert all(not os.path.exists(p) for p in removed)
    assert os.path.exists(compacted)
    # at/above the horizon: intact
    assert txlog.read_snapshot(spark, table, as_of_version=4).count() == 12
    # below the horizon: loud failure, never silently partial data
    with pytest.raises(ValueError, match="vacuum horizon"):
        txlog.read_snapshot(spark, table, as_of_version=3)


def test_vacuum_is_idempotent(spark, table):
    txlog.compact(spark, table, version=4)
    first = txlog.vacuum(table, retain_from_version=4)
    assert len(first) == 3
    assert txlog.vacuum(table, retain_from_version=4) == []
    assert txlog.read_snapshot(spark, table).count() == 12


def test_empty_log_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        txlog.read_snapshot(spark, str(tmp_path))


def test_rewrite_commit_replaces_snapshot_and_preserves_history(spark, table):
    """plans/txlog.rewrite: the MERGE-writer shape — new content becomes
    the whole snapshot, priors stay time-travelable until vacuum."""
    new = spark.createDataFrame([Row(k=99, ver=4)])
    txlog.rewrite(table, new, 4)
    assert txlog.read_snapshot(spark, table).count() == 1
    assert txlog.read_snapshot(spark, table, as_of_version=4).count() == 1
    # pre-rewrite snapshots unchanged (removes are logical)
    assert txlog.read_snapshot(spark, table, as_of_version=3).count() == 12
    assert txlog.read_snapshot(spark, table, as_of_version=2).count() == 6
    # vacuum now reclaims the superseded deltas; latest stays readable
    removed = txlog.vacuum(table, retain_from_version=4)
    assert len(removed) == 3
    assert txlog.read_snapshot(spark, table).count() == 1
    with pytest.raises(ValueError, match="vacuum horizon"):
        txlog.read_snapshot(spark, table, as_of_version=3)


def test_merge_txlog_replay_is_idempotent(spark):
    """op-ext-merge-txlog end-to-end: running the whole MERGE→audit→
    publish lifecycle twice produces the identical ledger (scratch
    rebuild = replay after crash), the poison batch never publishes,
    and v1 time-travel shows the pre-merge state."""
    from data_warehousing_assignment_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    q = all_queries()["op-ext-merge-txlog"]
    first = sorted(map(tuple, q(spark, SF_SMALL).collect()))
    second = sorted(map(tuple, q(spark, SF_SMALL).collect()))
    assert first == second
    rows = {
        d["version"]: d
        for d in (
            dict(
                zip(
                    ["version", "n_rows", "sum_cents", "published",
                     "is_latest"],
                    tp,
                )
            )
            for tp in first
        )
    }
    assert rows[2]["is_latest"] and rows[2]["published"]
    assert not rows[3]["published"] and not rows[3]["is_latest"]
    assert rows[1]["published"] and not rows[1]["is_latest"]
    # the poison candidate has the same row count as v2 (pure updates)
    assert rows[3]["n_rows"] == rows[2]["n_rows"]
    assert rows[3]["sum_cents"] < rows[2]["sum_cents"]
