"""Deterministic hash-split / stratified-sampling tests: stability
across reruns, full coverage, approximate proportions, and salt
decorrelation — the properties a training pipeline leans on."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators import text as tx
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_split_covers_everything_once(spark):
    d = _docs(spark).select("doc_id", tx.hash_split("doc_id").alias("split"))
    n = d.count()
    assert d.filter(F.col("split").isin("train", "val", "test")).count() == n


def test_split_proportions_roughly_80_10_10(spark):
    d = _docs(spark).select(tx.hash_split("doc_id").alias("split"))
    n = d.count()
    frac = {
        r.split: r["count"] / n for r in d.groupBy("split").count().collect()
    }
    assert 0.70 <= frac["train"] <= 0.90
    assert 0.04 <= frac["val"] <= 0.18
    assert 0.04 <= frac["test"] <= 0.18


def test_split_is_stable_across_runs_and_partitionings(spark):
    d = _docs(spark)
    a = {(r.doc_id, r.split) for r in d.select(
        "doc_id", tx.hash_split("doc_id").alias("split")).collect()}
    b = {(r.doc_id, r.split) for r in d.repartition(7).select(
        "doc_id", tx.hash_split("doc_id").alias("split")).collect()}
    assert a == b


def test_bucket_range_and_salt_decorrelation(spark):
    d = _docs(spark).select(
        tx.hash_bucket("doc_id", "split:").alias("b1"),
        tx.hash_bucket("doc_id", "strat:").alias("b2"),
    )
    rows = d.collect()
    assert all(0 <= r.b1 <= 255 and 0 <= r.b2 <= 255 for r in rows)
    # different salts must not produce the same bucketing
    assert any(r.b1 != r.b2 for r in rows)
