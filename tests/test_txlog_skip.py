"""Manifest-stats skipping pins: exactly one of three yearly files is
scanned for a one-year predicate; statless files are never skipped;
crypto-shred erasure is provably irreversible without the key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans import txlog

SF = "/root/testdata/sf0.001"


def _yearly_commits(spark, root, with_stats=True):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str"),
    )
    for v, year in enumerate((1995, 1996, 1997), start=1):
        batch = orders.filter(F.col("od_str").startswith(str(year)))
        if with_stats:
            txlog.commit_with_stats(root, batch, v, "od_str")
        else:
            txlog.commit(root, batch, v)
    return orders


def test_skipped_read_scans_exactly_one_file(spark, tmp_path):
    root = str(tmp_path / "sk")
    orders = _yearly_commits(spark, root)
    snap, scanned, skipped = txlog.skipped_read(
        spark, root, lo="1996-01-01", hi="1996-12-31"
    )
    assert len(scanned) == 1 and len(skipped) == 2
    # the surviving file holds every 1996 row — skipping lost nothing
    want = orders.filter(F.col("od_str").startswith("1996")).count()
    got = snap.filter(F.col("od_str").startswith("1996")).count()
    assert got == want


def test_statless_files_are_never_skipped(spark, tmp_path):
    root = str(tmp_path / "ns")
    _yearly_commits(spark, root, with_stats=False)
    _, scanned, skipped = txlog.skipped_read(
        spark, root, lo="1996-01-01", hi="1996-12-31"
    )
    assert len(scanned) == 3 and skipped == []


def test_fully_pruned_read_raises(spark, tmp_path):
    root = str(tmp_path / "fp")
    _yearly_commits(spark, root)
    with pytest.raises(ValueError, match="prunes every file"):
        txlog.skipped_read(spark, root, lo="2050-01-01", hi="2050-12-31")


def test_crypto_shred_is_irreversible(spark):
    from data_warehousing_assignment_spark.registry_warehouse import (
        op_ext_crypto_shred,
    )

    out = op_ext_crypto_shred(spark, SF)
    shredded = out.filter(F.col("c_custkey") % 13 == 0)
    assert shredded.count() > 0
    # no key → no digest, flagged undecryptable
    assert shredded.filter(F.col("decryptable")).count() == 0
    assert shredded.filter(F.col("name_digest").isNotNull()).count() == 0
    # surviving users fully decryptable
    kept = out.filter(F.col("c_custkey") % 13 != 0)
    assert kept.filter(~F.col("decryptable")).count() == 0


def test_numeric_stats_skip_numerically_not_lexically(spark, tmp_path):
    """'99' > '200' lexically — numeric stats must compare as numbers
    (the pre-review str() bug skipped files containing matches)."""
    root = str(tmp_path / "num")
    a = spark.createDataFrame([(99,), (150,)], ["amount"])
    b = spark.createDataFrame([(900,), (950,)], ["amount"])
    txlog.commit_with_stats(root, a, 1, "amount")
    txlog.commit_with_stats(root, b, 2, "amount")
    snap, scanned, skipped = txlog.skipped_read(spark, root, lo=100, hi=200)
    assert len(scanned) == 1 and len(skipped) == 1
    assert snap.filter(F.col("amount") == 150).count() == 1
    # mismatched predicate type → stats unusable → everything scanned
    _, scanned2, skipped2 = txlog.skipped_read(
        spark, root, lo="100", hi="200"
    )
    assert len(scanned2) == 2 and skipped2 == []


def test_skipped_read_respects_vacuum_horizon(spark, tmp_path):
    import pytest as _pt

    root = str(tmp_path / "hz")
    _yearly_commits(spark, root)
    txlog.compact(spark, root, 4)
    txlog.vacuum(root, 4)
    with _pt.raises(ValueError, match="vacuum horizon"):
        txlog.skipped_read(
            spark, root, lo="1996-01-01", hi="1996-12-31", as_of_version=2
        )
