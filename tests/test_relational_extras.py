"""Round-8 SQL-surface additions: OFFSET pagination (+ the keyset
equivalence that makes deep pagination scale), the recursive-CTE
monthly spine, the one-pass correlation matrix, and the XML scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from data_warehousing_assignment_spark.registry import dec, t
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_offset_page_equals_keyset_pagination(spark, qs):
    """Page 3 by OFFSET must equal page 3 by keyset (WHERE (bal, key)
    after the last row of page 2) — the rewrite that turns O(depth)
    pagination into O(page) at scale."""
    page3 = qs["op-ext-offset-page"](spark, SF_SMALL).collect()
    c = t(spark, SF_SMALL, "customer").select(
        "c_custkey",
        "c_name",
        (dec("c_acctbal") * 100).cast("bigint").alias("acctbal_c"),
    )
    ordered = c.orderBy(F.desc("acctbal_c"), F.asc("c_custkey"))
    last = ordered.limit(50).collect()[-1]  # last row of page 2
    keyset = (
        ordered.filter(
            (F.col("acctbal_c") < last["acctbal_c"])
            | (
                (F.col("acctbal_c") == last["acctbal_c"])
                & (F.col("c_custkey") > last["c_custkey"])
            )
        )
        .limit(25)
        .collect()
    )
    assert [tuple(r) for r in page3] == [tuple(r) for r in keyset]


def test_recursive_spine_is_dense_and_gap_filled(spark, qs):
    rows = qs["op-ext-recursive-spine"](spark, SF_SMALL).collect()
    months = sorted(r["month"] for r in rows)
    assert len(months) == 80 and len(set(months)) == 80
    assert months[0] == "1995-01" and months[-1] == "2001-08"
    by_m = {r["month"]: r for r in rows}
    # spine is contiguous: every month between the ends is present
    y, m = 1995, 1
    for _ in range(80):
        assert f"{y:04d}-{m:02d}" in by_m
        m += 1
        if m == 13:
            y, m = y + 1, 1
    # the sparse subgroup leaves zero-months, and they are explicit 0s
    zeros = [r for r in rows if r["n_orders"] == 0]
    assert zeros and all(r["rev_c"] == 0 for r in zeros)


def test_corr_matrix_matches_builtin_corr(spark, qs):
    rows = qs["op-ext-corr-matrix"](spark, SF_SMALL).collect()
    assert len(rows) == 6  # C(4,2) pairs
    got = {(r["var_a"], r["var_b"]): r["pearson_r"] for r in rows}
    li = (
        t(spark, SF_SMALL, "lineitem")
        .withColumn("qty", F.col("l_quantity").cast("bigint"))
        .withColumn(
            "price_c", (dec("l_extendedprice") * 100).cast("bigint")
        )
    )
    ref = li.agg(F.corr("qty", "price_c")).collect()[0][0]
    assert got[("qty", "price_c")] == pytest.approx(ref, abs=1e-9)
    for r in rows:
        assert abs(r["pearson_r"]) <= 1.0 + 1e-12


def test_xml_scan_round_trips_nation(spark, qs):
    back = qs["op-scan-xml"](spark, SF_SMALL)
    src = t(spark, SF_SMALL, "nation")
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_pandas_api_stays_distributed(spark, qs):
    """The pandas-on-Spark bridge must trace to the same distributed
    hash aggregate as the native op — no driver-side materialization
    (an ExistingRDD scan would mean the data passed through the
    driver)."""
    df = qs["op-ext-pandas-api"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "ExistingRDD" not in plan
    assert "partial_sum" in plan  # map-side combine survived the bridge
    # and the values equal the native op's (same exact-decimal contract)
    native = {
        r["user_id"]: r["mean_value"]
        for r in qs["op-agg-groupby-mean"](spark, SF_SMALL).collect()
    }
    got = {r["user_id"]: r["mean_value"] for r in df.collect()}
    assert got == native
