"""Role-scoped access: the reference's grant matrix enforced at view
resolution, plus column-mask/row-policy semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans import access


def make_views(spark):
    df = spark.createDataFrame(
        [("IT", 55000.0), ("HR", 61000.0)], "dept string, salary double"
    )
    return {name: (lambda df=df: df) for name in (
        "vw_kpi_headcount",
        "vw_kpi_avg_salary_by_gender",
        "vw_kpi_downtime_by_process",
    )}


def test_grant_matrix_enforced(spark):
    views = make_views(spark)
    # hr_analyst reads HR views, not ops views
    out = access.resolve_view("hr_analyst", "vw_kpi_headcount", views)
    assert out.count() == 2
    with pytest.raises(access.AccessDenied):
        access.resolve_view("hr_analyst", "vw_kpi_downtime_by_process", views)
    with pytest.raises(access.AccessDenied):
        access.resolve_view("nobody", "vw_kpi_headcount", views)
    # dw_admin reads everything
    assert access.resolve_view(
        "dw_admin", "vw_kpi_downtime_by_process", views
    ).count() == 2


def test_column_mask_nulls_salary(spark):
    df = spark.createDataFrame(
        [("IT", 55000.0), ("HR", 61000.0)], "dept string, salary double"
    )
    masked = access.with_column_mask(df, {"salary": F.lit(None)})
    assert masked.columns == df.columns
    assert [r.salary for r in masked.collect()] == [None, None]
    assert {r.dept for r in masked.collect()} == {"IT", "HR"}


def test_row_policy_filters(spark):
    df = spark.createDataFrame(
        [("IT", 1.0), ("HR", 2.0), ("IT", 3.0)], "dept string, v double"
    )
    scoped = access.with_row_policy(df, F.col("dept") == "IT")
    assert scoped.count() == 2
