"""Data-quality + audit logging frames (op-pipe-dq / op-pipe-audit).

Reference: every repair appends a DQ row (job_id, table_name, column_name,
row_reference, original_value, issue) (ref
``02_Extract_and_transform_raw_data/A2_hr_etl.py:32-36,58-62``, schema
``combined_dw_schema.sql:133-142``), and every stage appends an audit row
with rows_processed / rows_failed / status ∈ {success, partial, failed}
(ref ``A2_hr_etl.py:103-119``, ``B3_load_fin_facts.sql:106-126``).

Spark-first: the reference builds these logs row-at-a-time inside Python
loops; here each issue class is one filtered projection and the log is a
union — the issue scan is the same columnar pass as the cleaning itself,
and the audit counts are plan-side aggregates (no driver collect)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DQ_COLUMNS = ("table_name", "column_name", "row_reference", "original_value", "issue")


def dq_issues(
    df: DataFrame,
    table_name: str,
    column_name: str,
    row_ref: str | Column,
    predicate: Column,
    issue: str,
) -> DataFrame:
    """One DQ-log slice: rows of ``df`` where ``predicate`` holds, shaped
    to the reference's data_quality_log schema (ref
    ``combined_dw_schema.sql:133-142``; job_id is stamped by the caller —
    it is per-run, not per-issue)."""
    ref = F.col(row_ref) if isinstance(row_ref, str) else row_ref
    return df.filter(predicate).select(
        F.lit(table_name).alias("table_name"),
        F.lit(column_name).alias("column_name"),
        ref.cast("string").alias("row_reference"),
        F.col(column_name).cast("string").alias("original_value"),
        F.lit(issue).alias("issue"),
    )


def union_dq(*slices: DataFrame) -> DataFrame:
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


def audit_frame(
    df: DataFrame,
    table_name: str,
    etl_stage: str,
    failed_predicate: Column,
) -> DataFrame:
    """One audit row computed plan-side: rows_processed = COUNT(*),
    rows_failed = COUNT_IF(failed_predicate), status per the reference's
    rules — 0 failed → success, some → partial, all → failed (ref
    ``A2_hr_etl.py:103-119``)."""
    counted = df.agg(
        F.count(F.lit(1)).alias("rows_processed"),
        F.count_if(failed_predicate).alias("rows_failed"),
    )
    status = (
        F.when(F.col("rows_failed") == 0, F.lit("success"))
        .when(F.col("rows_failed") < F.col("rows_processed"), F.lit("partial"))
        .otherwise(F.lit("failed"))
    )
    return counted.select(
        F.lit(table_name).alias("table_name"),
        F.lit(etl_stage).alias("etl_stage"),
        "rows_processed",
        "rows_failed",
        status.alias("status"),
        F.format_string(
            "Processed %d rows, %d failed", F.col("rows_processed"), F.col("rows_failed")
        ).alias("message"),
    )
