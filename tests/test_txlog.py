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
