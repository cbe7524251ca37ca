"""TPC-H macro wave (registry_tpch.py): semantic invariants + the plan
shapes each query is designed around. Value-exactness vs DuckDB is the
oracle gate's job (tools/check_local.py, driver CORRECTNESS); these
tests pin what the oracle can't see — plan structure and the internal
consistency of num/denom pairs, semi/anti-join bounds, and tie
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from data_warehousing_assignment_spark.registry import t
from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


# ---------------------------------------------------------------- semantics


def test_q1_partitions_every_line_once(spark, qs):
    rows = qs["op-ext-tpch-q1"](spark, SF_SMALL).collect()
    li = t(spark, SF_SMALL, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    assert sum(r["count_order"] for r in rows) == li.count()
    for r in rows:
        # avg columns are exactly sum/count of the same row
        assert r["avg_qty_c"] == r["sum_qty_c"] / r["count_order"]
        assert 0 <= r["avg_disc_pct"] <= 100


def test_q4_counts_orders_not_lineitems(spark, qs):
    rows = qs["op-ext-tpch-q4"](spark, SF_SMALL).collect()
    n_orders = (
        t(spark, SF_SMALL, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-07-01")
            & (F.col("o_orderdate") < "1996-10-01")
        )
        .count()
    )
    total = sum(r["order_count"] for r in rows)
    assert 0 < total <= n_orders  # semi join can never exceed the order count


def test_q8_and_q14_share_is_a_true_fraction(spark, qs):
    for name, num, den in (
        ("op-ext-tpch-q8", "mkt_rev_c4", "total_rev_c4"),
        ("op-ext-tpch-q14", "promo_rev_c4", "total_rev_c4"),
    ):
        for r in qs[name](spark, SF_SMALL).collect():
            assert 0 <= r[num] <= r[den], name


def test_q13_keeps_zero_order_customers(spark, qs):
    rows = {r["c_count"]: r["custdist"] for r in
            qs["op-ext-tpch-q13"](spark, SF_SMALL).collect()}
    n_cust = t(spark, SF_SMALL, "customer").count()
    assert sum(rows.values()) == n_cust  # every customer lands in a bucket


def test_q15_returns_all_ties_at_the_max(spark, qs):
    rows = qs["op-ext-tpch-q15"](spark, SF_SMALL).collect()
    assert len(rows) >= 1
    assert len({r["total_rev_c4"] for r in rows}) == 1  # all at the max


def test_q17_integer_predicate_equals_float_formulation(spark, qs):
    """5·qty·n < Σqty (integer cents) must select exactly the rows the
    float formulation qty < 0.2·avg(qty) selects — the decorrelation
    and the exact-arithmetic rewrite change no membership."""
    got = qs["op-ext-tpch-q17"](spark, SF_SMALL).collect()[0]
    li = t(spark, SF_SMALL, "lineitem")
    p = t(spark, SF_SMALL, "part").filter(F.col("p_brand") == "Brand#11")
    avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg"))
    naive = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg"))
        .count()
    )
    assert got["n_small"] == naive


def test_q18_threshold_holds_on_every_row(spark, qs):
    for r in qs["op-ext-tpch-q18"](spark, SF_SMALL).collect():
        assert r["sum_qty_c"] > 200 * 100  # >200 units, in cents


def test_q22_selects_only_lapsed_customers(spark, qs):
    rows = qs["op-ext-tpch-q22"](spark, SF_SMALL).collect()
    assert sum(r["numcust"] for r in rows) >= 1
    for r in rows:
        assert r["totacctbal_c"] > 0  # above-positive-average ⇒ positive


# ------------------------------------------------------------- plan shapes


def test_q1_is_pure_partial_aggregation(spark, qs):
    plan = plan_of(qs["op-ext-tpch-q1"](spark, SF_SMALL))
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "Join" not in plan
    # each predicate asserted individually — the joined PushedFilters
    # display string's ordering/truncation is not contractual (r8 review)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan


def test_q6_pushes_every_scan_predicate(spark, qs):
    plan = plan_of(qs["op-ext-tpch-q6"](spark, SF_SMALL))
    assert "Join" not in plan
    # the qty/discount/date predicates reach the parquet scan; assert
    # each pushed IsNotNull guard individually rather than the ordered
    # joined prefix, whose column order/truncation is display-only
    # (r8 review)
    assert "PushedFilters: [" in plan
    for pred in (
        "IsNotNull(l_shipdate)",
        "IsNotNull(l_discount)",
        "IsNotNull(l_quantity)",
    ):
        assert pred in plan, pred


def test_q10_q18_global_topk_is_takeordered(spark, qs):
    for name in ("op-ext-tpch-q10", "op-ext-tpch-q18"):
        plan = plan_of(qs[name](spark, SF_SMALL))
        assert "TakeOrderedAndProject" in plan, name
        assert "WindowExec" not in plan, name  # never a global ranking window
        assert "BroadcastHashJoin" in plan, name


def test_q7_q8_broadcast_reduced_dims(spark, qs):
    for name in ("op-ext-tpch-q7", "op-ext-tpch-q8"):
        plan = plan_of(qs[name](spark, SF_SMALL))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_q15_max_filter_is_broadcast_not_window(spark, qs):
    plan = plan_of(qs["op-ext-tpch-q15"](spark, SF_SMALL))
    assert "WindowExec" not in plan  # 1-row max frame, not a global window
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q19_or_predicate_stays_on_broadcast_join(spark, qs):
    plan = plan_of(qs["op-ext-tpch-q19"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the brand pre-filter reaches the part scan
    assert "In(p_brand" in plan


def test_q22_anti_join_with_prefiltered_orders(spark, qs):
    plan = plan_of(qs["op-ext-tpch-q22"](spark, SF_SMALL))
    assert "LeftAnti" in plan
    # the 1999 cutoff reaches the orders scan, pre-pruning the anti side
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q2_returns_only_minimum_cost_suppliers(spark, qs):
    """Every returned cost must EQUAL the true per-part min recomputed
    from scratch (r8 review: a single-distinct-cost check would also
    pass a regression to F.max)."""
    rows = qs["op-ext-tpch-q2"](spark, SF_SMALL).collect()
    from data_warehousing_assignment_spark.registry_tpch import _ps

    eu_sup = (
        t(spark, SF_SMALL, "supplier")
        .join(
            t(spark, SF_SMALL, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t(spark, SF_SMALL, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    true_min = {
        r["l_partkey"]: r["m"]
        for r in _ps(spark, SF_SMALL)
        .join(eu_sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.min("cost_c").alias("m"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["cost_c"] == true_min[r["p_partkey"]], r["p_partkey"]


def test_q11_share_threshold_holds(spark, qs):
    rows = qs["op-ext-tpch-q11"](spark, SF_SMALL).collect()
    # recompute the nation total from scratch and re-check the filter
    from data_warehousing_assignment_spark.registry_tpch import _rev_c4

    li = t(spark, SF_SMALL, "lineitem")
    s = t(spark, SF_SMALL, "supplier")
    n = t(spark, SF_SMALL, "nation").filter(F.col("n_name") == "NATION_7")
    val = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_rev_c4()).alias("v"))
    )
    total = val.agg(F.sum("v")).collect()[0][0]
    for r in rows:
        assert r["value_c4"] * 1000 > total


def test_q21_each_order_blames_at_most_one_supplier(spark, qs):
    rows = qs["op-ext-tpch-q21"](spark, SF_SMALL).collect()
    li = t(spark, SF_SMALL, "lineitem")
    o = t(spark, SF_SMALL, "orders").filter(F.col("o_orderstatus") == "F")
    n_f_orders = o.count()
    assert sum(r["numwait"] for r in rows) <= n_f_orders


def test_adapted_queries_broadcast_dims(spark, qs):
    for name in ("op-ext-tpch-q2", "op-ext-tpch-q9", "op-ext-tpch-q16",
                 "op-ext-tpch-q20"):
        plan = plan_of(qs[name](spark, SF_SMALL))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


# ------------------------------------------------- fact⋈fact shuffle story


def test_q7_single_wide_shuffle_join_rest_broadcast(spark, qs):
    """Q7 is the fact⋈fact shape whose 10× probe ran at 1.9× — its
    100× story is that lineitem⋈orders on orderkey is the ONLY
    shuffle join (both nation-reduced dims broadcast, the ship-date
    filter pushed to the scan). On a production table the residual
    mitigation is bucketing both facts on orderkey (the mechanism
    op-ext-bucket-join demonstrates: co-located scans, zero exchange);
    this guard pins that the plan never regresses into a second wide
    join or a plan-level cartesian."""
    plan = plan_of(qs["op-ext-tpch-q7"](spark, SF_SMALL))
    n_smj = plan.count("SortMergeJoin")
    n_shj = plan.count("ShuffledHashJoin")
    # ≤ 1: at sf0.001 AQE legitimately broadcasts even the orderkey
    # join (orders is tiny); what must NEVER appear is a SECOND wide
    # join — that would mean a dim side stopped broadcasting.
    assert n_smj + n_shj <= 1, (n_smj, n_shj)
    assert plan.count("BroadcastHashJoin") >= 2  # supplier+customer sides
    assert "CartesianProduct" not in plan
    assert "IsNotNull(l_shipdate)" in plan  # date filter reached the scan


def test_q21_orderkey_aggs_are_partial_before_exchange(spark, qs):
    """Q21 (10× probe 2.4× — the widest fact shape): both per-order
    reductions (max ship date, distinct-supplier count) must partial-
    aggregate map-side BEFORE the orderkey exchange, so the shuffle
    carries one row per (order, supplier-ish) group, not raw lineitem;
    supplier resolution stays broadcast. Bucketing lineitem on
    l_orderkey removes the remaining exchanges entirely in production
    (op-ext-bucket-join pins that mechanism)."""
    plan = plan_of(qs["op-ext-tpch-q21"](spark, SF_SMALL))
    assert "partial_max" in plan or "partial_first" in plan
    assert "Exchange" in plan
    # map-side partial agg appears below the exchange for the stats agg
    assert plan.index("partial_max") > plan.index("Exchange") or (
        "HashAggregate" in plan
    )
    assert "CartesianProduct" not in plan
    # supplier lookup is broadcast, never a wide join
    assert "BroadcastHashJoin" in plan


def test_q7_bucketed_eliminates_the_fact_shuffle(spark, qs):
    """op-ext-tpch-q7-bucketed: both facts bucketBy(orderkey) ⇒ the
    lineitem⋈orders SMJ reads bucket-to-bucket with ZERO shuffle
    exchange below it — the only hashpartitioning exchange in the whole
    plan is the final group-by. The storage-layer fix for the one wide
    join test_q7_single_wide_shuffle_join_rest_broadcast allows."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # forbid auto-broadcast so the fact join takes the SMJ path it
    # would at real scale (sf0.001 orders would otherwise broadcast);
    # the dims stay broadcast via their explicit hints
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["op-ext-tpch-q7-bucketed"](spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the agg only
    assert "bkt_q7_lineitem" in plan and "bkt_q7_orders" in plan
    assert "CartesianProduct" not in plan


def test_q21_bucketed_single_exchange(spark, qs):
    """op-ext-tpch-q21-bucketed: with both facts bucketed on orderkey
    and the per-order stats as a WINDOW (not an agg+join-back whose
    shipdate equality becomes a join key), the ONLY hash exchange in
    the plan is the final 100-row supplier rollup — semi join, window
    stats, distinct and the sole-survivor aggregate all reuse the
    on-disk distribution."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["op-ext-tpch-q21-bucketed"](spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "bkt_q21_lineitem" in plan and "bkt_q21_orders" in plan
    assert "CartesianProduct" not in plan


def test_q9_bucketed_eliminates_the_fact_shuffle(spark, qs):
    """op-ext-tpch-q9-bucketed: with lineitem AND orders bucketBy
    (orderkey), the dims broadcast via hints and the fact SMJ reading
    bucket-to-bucket, the ONLY hash exchange left is the nations×years
    final aggregate (r9 verdict #3 — q9 was the worst remaining TPC-H
    scale ratio, 4.1x at the 100x probe)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["op-ext-tpch-q9-bucketed"](spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the agg only
    assert "bkt_q9_lineitem" in plan and "bkt_q9_orders" in plan
    assert "CartesianProduct" not in plan


def test_q9_bucketed_matches_plain(spark, qs):
    """Layout, not answer: the bucketed twin returns exactly the plain
    twin's rows."""
    canon = lambda df: sorted(
        (r.nation, r.o_year, r.profit_c4) for r in df.collect()
    )
    assert canon(qs["op-ext-tpch-q9-bucketed"](spark, SF_SMALL)) == canon(
        qs["op-ext-tpch-q9"](spark, SF_SMALL)
    )
