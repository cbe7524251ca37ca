"""SCD Type 2 merge invariants (ref ``A3_load_dim_emp.sql:27-62``; dbt
``snapshots/scd2_dim_employee.sql``): ≤1 current row per key, valid
ranges ordered, re-running the same batch is a no-op (idempotent), and
changed rows expire-then-insert."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans.scd2 import (
    assert_scd2_invariants,
    merge_scd2,
    scd2_row_hash,
)

KEY, ATTRS = "emp_id", ["name", "dept"]


def mk_dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "emp_id string, name string, dept string, row_hash string, "
        "valid_from date, valid_to date, is_current boolean",
    )


def mk_inc(spark, rows):
    return spark.createDataFrame(rows, "emp_id string, name string, dept string")


def seed_dim(spark, as_of="2024-01-01"):
    inc = mk_inc(spark, [("E1", "Ann", "IT"), ("E2", "Bob", "HR")])
    empty = mk_dim(spark, [])
    return merge_scd2(empty, inc, KEY, ATTRS, as_of)


def test_initial_load_all_current(spark):
    dim = seed_dim(spark)
    rows = dim.collect()
    assert len(rows) == 2
    assert all(r.is_current and r.valid_to is None for r in rows)
    assert all(r.valid_from == dt.date(2024, 1, 1) for r in rows)
    inv = assert_scd2_invariants(dim, KEY)
    assert inv == {"multi_current_keys": 0, "bad_valid_ranges": 0, "broken_chains": 0}


def test_changed_row_expires_and_inserts(spark):
    dim = seed_dim(spark)
    inc2 = mk_inc(spark, [("E1", "Ann", "FINANCE"), ("E2", "Bob", "HR")])
    dim2 = merge_scd2(dim, inc2, KEY, ATTRS, "2024-02-01")
    e1 = {(r.dept, r.is_current): r for r in dim2.filter(F.col(KEY) == "E1").collect()}
    assert ("IT", False) in e1 and ("FINANCE", True) in e1
    assert e1[("IT", False)].valid_to == dt.date(2024, 2, 1)
    assert e1[("FINANCE", True)].valid_from == dt.date(2024, 2, 1)
    # unchanged key untouched
    e2 = dim2.filter(F.col(KEY) == "E2").collect()
    assert len(e2) == 1 and e2[0].is_current
    inv = assert_scd2_invariants(dim2, KEY)
    assert inv == {"multi_current_keys": 0, "bad_valid_ranges": 0, "broken_chains": 0}


def test_rerun_same_batch_is_idempotent(spark):
    dim = seed_dim(spark)
    inc = mk_inc(spark, [("E1", "Ann", "IT"), ("E2", "Bob", "HR")])
    dim2 = merge_scd2(dim, inc, KEY, ATTRS, "2024-03-01")
    a = sorted(map(tuple, dim.collect()))
    b = sorted(map(tuple, dim2.collect()))
    assert a == b


def test_null_attribute_change_detected(spark):
    # (NULL, 'x') vs ('x', NULL) must hash differently (null-safe hash)
    dim = merge_scd2(
        mk_dim(spark, []),
        mk_inc(spark, [("E1", None, "IT")]),
        KEY,
        ATTRS,
        "2024-01-01",
    )
    dim2 = merge_scd2(
        dim, mk_inc(spark, [("E1", "IT", None)]), KEY, ATTRS, "2024-02-01"
    )
    cur = dim2.filter(F.col("is_current")).collect()
    assert len(cur) == 1 and cur[0].name == "IT" and cur[0].dept is None
    assert dim2.count() == 2  # old row expired, not collapsed


def test_row_hash_concat_ws_null_distinction(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "a")], "x string, y string"
    ).select(scd2_row_hash(["x", "y"]).alias("h"))
    h1, h2 = [r.h for r in df.collect()]
    assert h1 != h2
