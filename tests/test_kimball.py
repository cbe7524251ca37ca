"""Kimball-wave invariants: SCD1/SCD3 merge semantics, exact bridge
reconciliation, MERGE INTO clause coverage, junk-dim key density."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans.kimball import (
    bridge_allocate,
    junk_dimension,
    merge_into,
    overwrite_dim,
    scd3_merge,
)

SF = "/root/testdata/sf0.001"


def test_scd1_overwrite_semantics(spark):
    cur = spark.createDataFrame(
        [(1, "a", "X"), (2, "b", "Y"), (3, "c", "Z")],
        ["k", "name", "seg"],
    )
    inc = spark.createDataFrame(
        [(2, "b", "Y2"), (3, "c", "Z"), (4, "d", "W")],
        ["k", "name", "seg"],
    )
    out = {
        r["k"]: r
        for r in overwrite_dim(cur, inc, "k", ["name", "seg"]).collect()
    }
    assert out[1]["change_type"] == "kept" and out[1]["seg"] == "X"
    assert out[2]["change_type"] == "updated" and out[2]["seg"] == "Y2"
    assert out[3]["change_type"] == "unchanged"
    assert out[4]["change_type"] == "inserted" and out[4]["seg"] == "W"


def test_scd3_two_rounds_slide_and_persist(spark):
    cur = spark.createDataFrame(
        [(1, "A", None, None), (2, "B", "B0", "2020-01-01")],
        ["k", "seg", "prev_seg", "attr_changed_on"],
    )
    inc1 = spark.createDataFrame([(1, "A2"), (2, "B")], ["k", "seg"])
    r1 = scd3_merge(cur, inc1, "k", "seg", "prev_seg", "2024-01-01")
    m1 = {r["k"]: r for r in r1.collect()}
    # changed key: old current slides into prev, stamp updates
    assert m1[1]["seg"] == "A2" and m1[1]["prev_seg"] == "A"
    assert m1[1]["attr_changed_on"] == "2024-01-01"
    # unchanged key: pre-existing prev value and stamp persist
    assert m1[2]["prev_seg"] == "B0"
    assert m1[2]["attr_changed_on"] == "2020-01-01"
    # second no-op merge leaves everything in place
    inc2 = spark.createDataFrame([(1, "A2"), (2, "B")], ["k", "seg"])
    m2 = {
        r["k"]: r
        for r in scd3_merge(
            r1, inc2, "k", "seg", "prev_seg", "2025-01-01"
        ).collect()
    }
    assert m2[1]["prev_seg"] == "A" and m2[1]["attr_changed_on"] == "2024-01-01"


def test_bridge_allocation_reconciles_exactly(spark):
    """Largest-remainder invariant: per-group allocations sum EXACTLY to
    the header total, and each allocation differs from exact pro-rata by
    less than one cent."""
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"
            ).alias("total_cents"),
        )
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)"
        ).alias("weight_cents"),
    )
    fact = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderkey", "l_linenumber", "weight_cents", "total_cents"
    )
    alloc = bridge_allocate(
        fact, "o_orderkey", "l_linenumber", "weight_cents", "total_cents"
    )
    recon = (
        alloc.groupBy("o_orderkey")
        .agg(F.sum("alloc_cents").alias("s"))
        .join(orders, "o_orderkey")
        .filter(F.col("s") != F.col("total_cents"))
    )
    assert recon.count() == 0


def test_merge_into_clause_coverage(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    src = spark.createDataFrame(
        [
            (2, "b", 99, "U"),   # matched update
            (3, "c", 30, "D"),   # matched delete
            (4, "d", 40, "I"),   # unmatched insert
            (5, "e", 50, "D"),   # unmatched delete → ignored
        ],
        ["k", "s", "v", "op"],
    )
    out = {r["k"]: r for r in merge_into(tgt, src, "k", ["s", "v"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["v"] == 10      # untouched target persists
    assert out[2]["v"] == 99      # updated
    assert out[4]["v"] == 40      # inserted


def test_junk_dim_keys_dense_and_unique(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_discount") > 0).alias("is_discounted"),
        (F.col("l_tax") > 0).alias("is_taxed"),
    )
    jd = junk_dimension(
        li, ["l_returnflag", "l_linestatus", "is_discounted", "is_taxed"]
    ).collect()
    keys = sorted(r["junk_key"] for r in jd)
    assert keys == list(range(1, len(jd) + 1))
    combos = {
        (r["l_returnflag"], r["l_linestatus"], r["is_discounted"], r["is_taxed"])
        for r in jd
    }
    assert len(combos) == len(jd)
    # occupancy covers the whole fact
    assert sum(r["n_rows"] for r in jd) == li.count()


def test_junk_dim_null_flags_sort_last(spark):
    """Cross-engine surrogate stability: NULL flag combos take the
    HIGHEST keys (ANSI/DuckDB ASC default), not Spark's nulls-first."""
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), (None, "x"), ("a", "x")], ["f1", "f2"]
    )
    jd = {(r["f1"], r["f2"]): r["junk_key"]
          for r in junk_dimension(df, ["f1", "f2"]).collect()}
    assert jd[("a", "x")] < jd[("a", None)] < jd[(None, "x")]
