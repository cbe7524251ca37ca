"""Wave-6 pins: WAP atomic publish over the transaction log, zone-map
pruning soundness, NB classifier sanity, OLS vs numpy, autocorr bounds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry_ml import (
    op_ext_autocorr,
    op_ext_linreg,
    op_ext_text_classify,
)
from data_warehousing_assignment_spark.registry_warehouse import (
    op_ext_wap,
    op_ext_zonemap_prune,
)

SF = "/root/testdata/sf0.001"


def test_wap_publishes_only_clean_batch_through_txlog(spark, tmp_path):
    """The audit ledger drives txlog commits: clean batch becomes a
    visible version, dirty batch leaves NO trace — readers at the
    latest version see exactly the clean rows."""
    from data_warehousing_assignment_spark.plans import txlog

    ledger = {r["batch_id"]: r for r in op_ext_wap(spark, SF).collect()}
    assert ledger[1995]["published"] is True
    assert ledger[1995]["n_violations"] == 0
    assert ledger[1996]["published"] is False
    assert ledger[1996]["n_violations"] > 0

    root = str(tmp_path / "wap")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    version = 0
    for year in (1995, 1996):
        if ledger[year]["published"]:
            version += 1
            txlog.commit(
                root,
                orders.filter(F.year("o_orderdate") == year),
                version,
            )
    snap = txlog.read_snapshot(spark, root, as_of_version=version)
    got_years = {r[0] for r in snap.select(F.year("o_orderdate")).distinct().collect()}
    assert got_years == {1995}


def test_zonemap_prune_is_sound(spark):
    rows = op_ext_zonemap_prune(spark, SF).collect()
    # soundness: a pruned zone provably contains zero matches
    for r in rows:
        if not r["scanned"]:
            assert r["n_matching"] == 0
    # the demo predicate must actually prune something AND keep something
    assert any(not r["scanned"] for r in rows)
    assert any(r["scanned"] for r in rows)


def test_nb_classifier_beats_chance(spark):
    out = op_ext_text_classify(spark, SF)
    n = out.count()
    acc = out.filter(F.col("correct")).count() / n
    # 5 classes → chance ≈ 0.2 (±0.018 sd at n=500): must clearly beat it
    assert acc > 0.3, acc
    # row per document
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n == docs


def test_linreg_matches_numpy_lstsq(spark):
    rows = op_ext_linreg(spark, SF).collect()
    daily = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy(
            "l_returnflag",
            F.col("l_shipdate").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("y")
        )
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["l_returnflag"], []).append((r["d"], r["y"]))
    for row in rows:
        pts = sorted(series[row["l_returnflag"]])
        x0 = pts[0][0]
        x = np.array([(d - x0).days for d, _ in pts], dtype=np.float64)
        y = np.array([v for _, v in pts], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(row["slope_x1e6"] / 1e6 - slope) < max(1.0, abs(slope) * 1e-3)
        assert abs(row["intercept_x1e6"] / 1e6 - intercept) < max(
            10.0, abs(intercept) * 1e-3
        )
        assert row["n_days"] == len(pts)


def test_autocorr_bounded(spark):
    rows = op_ext_autocorr(spark, SF).collect()
    assert {r["lag_k"] for r in rows} == {1, 7}
    for r in rows:
        assert -1_000_000_000 <= r["autocorr_x1e9"] <= 1_000_000_000


def test_scd2_pit_multiplicity_exactly_one(spark):
    from data_warehousing_assignment_spark.registry_warehouse import (
        op_ext_scd2_pit,
    )

    out = op_ext_scd2_pit(spark, SF)
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    # every order matches exactly one validity interval
    assert out.count() == n_orders
    assert out.select("o_orderkey").distinct().count() == n_orders
    # pre-1997 orders of %4 customers see the historical segment
    hist = out.filter(
        (F.col("o_custkey") % 4 == 0) & (F.col("order_day") < "1997-01-01")
    )
    assert hist.count() > 0
    assert hist.filter(F.col("segment_at_order") != "OLDSEG").count() == 0


def test_orphan_check_counts(spark):
    from data_warehousing_assignment_spark.registry_warehouse import (
        op_ext_orphan_check,
    )

    rows = {r["check_name"]: r for r in op_ext_orphan_check(spark, SF).collect()}
    assert rows["orders->customer"]["n_orphans"] == 0
    bad = rows["lineitem->orders(purged)"]
    # orphans are exactly the lineitems of %11 parents
    expect = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 11 == 0)
        .count()
    )
    assert bad["n_orphans"] == expect > 0


def test_importance_score_targets_score_higher(spark):
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_importance_score,
    )

    out = op_ext_importance_score(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    j = out.join(docs, "doc_id")
    means = {
        r["is_t"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg(F.col("imp_score")).alias("m"))
        .collect()
    }
    # weak-signal corpus, but target docs must average >= raw docs
    assert means[True] >= means[False]


def test_scd2_backfill_invariants(spark):
    """The reconstructed history obeys the SCD2 contract: exactly one
    current row per key, intervals contiguous (valid_to == next
    valid_from), no overlaps."""
    from data_warehousing_assignment_spark.registry_warehouse import (
        op_pipe_scd2_backfill,
    )

    rows = op_pipe_scd2_backfill(spark, SF).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["o_custkey"], []).append(r)
    assert by_key
    for k, hist in by_key.items():
        hist.sort(key=lambda r: r["valid_from"])
        currents = [r for r in hist if r["is_current"]]
        assert len(currents) == 1, k
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"], k
            # a run boundary means the attribute actually changed
            assert a["o_orderpriority"] != b["o_orderpriority"], k
