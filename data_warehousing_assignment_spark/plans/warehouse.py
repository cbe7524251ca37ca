"""End-to-end warehouse ETL: the reference's three pipelines (HR,
Finance, Operations) as one orchestrated Spark job over the dirty
fixtures — extract/clean with DQ logging, conformed-dim upserts, SCD2
employee dim, time spine, snapshot + incremental facts, audit rows.

Reference entry points re-expressed (SURVEY.md §3):
* ``python ET_combined.py`` (pandas clean → staging, ref
  ``ET_combined.py:435-439``) → :func:`clean_hr` / :func:`clean_finance`
  / :func:`clean_ops`.
* ``psql \\i TL_combine.sql`` (dims + SCD2 + facts + audit, ref
  ``TL_combine.sql``) → :func:`load_warehouse`.

Everything is a lazy DataFrame DAG: "staging" is just the cleaned frame,
the reference's in-place staging mutation (ALTER/UPDATE ... FROM, ref
``A3_load_dim_emp.sql:22-39``) becomes immutable joins, and the
INSERT...RETURNING count bookkeeping becomes plan-side audit aggregates.

Semantics choices (SURVEY.md §8 quirks): Q3 duplicates ARE dropped (the
standalone-script behavior, not the combined script's bug); Q4 the
snapshot fact IS dedup-guarded; Q5 HR/Finance dates fall back to NULL,
Ops to 1957-01-01; Q7 gender keeps the full 'UNKNOWN' string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.functions import cleaning as cl
from data_warehousing_assignment_spark.functions.dates import build_dim_time
from data_warehousing_assignment_spark.operators.dedup import duplicate_rows
from data_warehousing_assignment_spark.plans.dq import audit_frame, dq_issues, union_dq
from data_warehousing_assignment_spark.plans.dims import upsert_dim
from data_warehousing_assignment_spark.plans.facts import incremental_fact_insert
from data_warehousing_assignment_spark.plans.scd2 import merge_scd2

GENDER_MAP = {"M": "M", "MALE": "M", "F": "F", "FEMALE": "F"}
STATUS_MAP = {"ACTIVE": "Active", "RESIGNED": "Resigned"}
EMP_ATTRS = ["name", "gender", "date_of_joining", "manager_id", "department"]


# --------------------------------------------------------------------------
# Extract + Transform (ref ET_combined.py / A2+B2+C2)
# --------------------------------------------------------------------------


def clean_hr(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """HR cleaning (ref ``A2_hr_etl.py:14-93``): returns (clean, dq_log).

    Fabricated employee ids use the hash path (TEMP_<md5 of attributes>)
    — no single-partition exchange, and the SAME id on a re-load of the
    same batch, which keeps SCD2 and the snapshot fact idempotent even
    for rows whose natural key was missing.
    """
    df = raw
    dq = union_dq(
        dq_issues(
            df, "staging_employee", "Gender", "EmployeeID",
            ~cl.normalize_upper_trim("Gender").isin(*GENDER_MAP), "invalid gender set to UNKNOWN",
        ),
        dq_issues(
            df, "staging_employee", "DateOfJoining", "EmployeeID",
            cl.parse_date_multi("DateOfJoining").isNull()
            & cl.blank_to_null("DateOfJoining").isNotNull(),
            "unparseable date set to NULL",
        ),
        dq_issues(
            df, "staging_employee", "Salary", "EmployeeID",
            cl.lenient_decimal("Salary") < 0, "negative salary repaired with abs()",
        ),
        dq_issues(
            df, "staging_employee", "ManagerID", "EmployeeID",
            cl.blank_to_null("ManagerID").isNull(), "missing manager set to UNKNOWN",
        ),
        duplicate_rows(df).select(
            F.lit("staging_employee").alias("table_name"),
            F.lit("*").alias("column_name"),
            F.col("EmployeeID").cast("string").alias("row_reference"),
            F.col("n_rows").cast("string").alias("original_value"),
            F.lit("exact duplicate rows dropped").alias("issue"),
        ),
    )
    clean = (
        df.dropDuplicates()
        .withColumn(
            "employee_id",
            cl.fallback_id_hash(
                "EmployeeID", "TEMP_",
                ["Name", "Department", "Gender", "DateOfJoining",
                 "ManagerID", "Salary", "Status"],
            ),
        )
        .withColumn(
            "department", cl.dedup_sentinels(cl.normalize_upper_trim("Department"), "UNASSIGNED_DEPT")
        )
        .withColumn("gender", cl.whitelist("Gender", GENDER_MAP, "UNKNOWN"))
        .withColumn("date_of_joining", cl.parse_date_multi("DateOfJoining"))
        .withColumn(
            "manager_id",
            F.coalesce(cl.blank_to_null(cl.strip_float_suffix("ManagerID")), F.lit("UNKNOWN")),
        )
        .withColumn("salary", F.abs(cl.lenient_decimal("Salary")))
        .withColumn("status", cl.whitelist("Status", STATUS_MAP, "Unknown"))
        .withColumn(
            "name",
            F.coalesce(
                cl.blank_to_null("Name"),
                F.concat(F.lit("EMP_"), F.col("employee_id")),
            ),
        )
        .select(
            "employee_id", "name", "department", "gender",
            "date_of_joining", "manager_id", "salary", "status",
        )
    )
    return clean, dq


def clean_finance(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Finance cleaning (ref ``B2_finance_etl.py:12-76``)."""
    df = raw
    dq = union_dq(
        dq_issues(
            df, "staging_finance", "ExpenseAmount", "EmployeeID",
            cl.lenient_decimal("ExpenseAmount") < 0, "negative amount flagged as refund",
        ),
        dq_issues(
            df, "staging_finance", "ApprovedBy", "EmployeeID",
            cl.blank_to_null("ApprovedBy").isNull(), "missing approver set to UNKNOWN",
        ),
    )
    clean = (
        df.dropDuplicates()
        .withColumn("employee_id", F.trim("EmployeeID"))
        .withColumn(
            "expense_type",
            cl.title_case(
                cl.remap_values(
                    cl.dedup_sentinels("ExpenseType", "Unknown"), {"Travell": "Travel"}
                )
            ),
        )
        .withColumn("expense_amount", cl.lenient_decimal("ExpenseAmount"))
        .withColumn("is_refund", F.col("expense_amount") < 0)
        .withColumn("expense_date", cl.parse_date_multi("ExpenseDate"))
        .withColumn(
            "approved_by",
            F.coalesce(cl.blank_to_null(cl.strip_float_suffix("ApprovedBy")), F.lit("UNKNOWN")),
        )
        .select(
            "employee_id", "expense_type", "expense_amount",
            "is_refund", "expense_date", "approved_by",
        )
    )
    return clean, dq


def clean_ops(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Operations cleaning (ref ``C2_ops_etl.py:12-113``): group-mean
    imputation for missing downtime, 1957 date fallback."""
    df = raw
    dq = union_dq(
        dq_issues(
            df, "staging_operations", "DowntimeHours", "ProcessName",
            cl.lenient_decimal("DowntimeHours").isNull(), "missing downtime imputed",
        ),
        dq_issues(
            df, "staging_operations", "ProcessDate", "ProcessName",
            cl.parse_date_multi("ProcessDate").isNull(), "invalid date set to 1957-01-01",
        ),
    )
    staged = (
        df.dropDuplicates()
        .withColumn(
            "department", cl.dedup_sentinels(cl.normalize_upper_trim("Department"), "UNASSIGNED_DEPT")
        )
        .withColumn("process_name", cl.dedup_sentinels("ProcessName", "UNKNOWN_PROCESS"))
        .withColumn("location", F.trim("Location"))
        .withColumn(
            "downtime_hours", cl.lenient_decimal("DowntimeHours", 10, 2).cast("double")
        )
        .withColumn(
            "process_date", cl.parse_date_multi("ProcessDate", fallback="1957-01-01")
        )
    )
    clean = cl.group_mean_impute(
        staged, "downtime_hours", ["department", "process_name", "location"]
    ).select("department", "process_name", "location", "downtime_hours", "process_date")
    return clean, dq


# --------------------------------------------------------------------------
# Transform + Load (ref TL_combine.sql)
# --------------------------------------------------------------------------


def empty_dim(spark: SparkSession, id_col: str, member_col: str) -> DataFrame:
    return spark.createDataFrame([], f"{id_col} int, {member_col} string")


def empty_scd2_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "employee_id string, name string, gender string, date_of_joining date, "
        "manager_id string, department string, row_hash string, "
        "valid_from date, valid_to date, is_current boolean",
    )


def load_warehouse(
    spark: SparkSession,
    hr_clean: DataFrame,
    fin_clean: DataFrame,
    ops_clean: DataFrame,
    load_date: str,
    prior: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Phase-3 load: dims (upsert + SCD2) → facts (snapshot + incremental)
    → audit. ``prior`` carries the previous warehouse state (same keys as
    the returned dict) so incremental semantics are first-class; omit it
    for an initial load. Returns the new state.
    """
    prior = prior or {}

    dim_department = upsert_dim(
        upsert_dim(
            prior.get("dim_department", empty_dim(spark, "department_id", "department_name")),
            hr_clean.select(F.col("department").alias("department_name")),
            "department_name", "department_id",
        ),
        ops_clean.select(F.col("department").alias("department_name")),
        "department_name", "department_id",
    )
    dim_expense_type = upsert_dim(
        prior.get("dim_expense_type", empty_dim(spark, "expense_type_id", "expense_type_name")),
        fin_clean.select(F.col("expense_type").alias("expense_type_name")),
        "expense_type_name", "expense_type_id",
    )
    dim_process = upsert_dim(
        prior.get("dim_process", empty_dim(spark, "process_id", "process_name")),
        ops_clean.select("process_name"), "process_name", "process_id",
    )
    dim_location = upsert_dim(
        prior.get("dim_location", empty_dim(spark, "location_id", "location_name")),
        ops_clean.select(F.col("location").alias("location_name")),
        "location_name", "location_id",
    )

    dim_employee = merge_scd2(
        prior.get("dim_employee", empty_scd2_dim(spark)),
        hr_clean.select("employee_id", *EMP_ATTRS),
        "employee_id", EMP_ATTRS, load_date,
    )

    dim_time = prior.get("dim_time")
    if dim_time is None:
        dim_time = build_dim_time(spark)

    # --- facts ------------------------------------------------------------
    emp_current = dim_employee.filter(F.col("is_current")).select(
        "employee_id", "department"
    )

    # Snapshot fact (ref A3_load_dim_emp.sql:85-95) + Q4 dedup guard
    time_today = dim_time.filter(F.col("full_date") == F.to_date(F.lit(load_date)))
    snapshot_batch = (
        hr_clean.join(emp_current, on="employee_id", how="left_semi")
        .crossJoin(F.broadcast(time_today.select("time_id")))
        .select("employee_id", "time_id", "salary", "status")
    )
    fact_employee_prior = prior.get(
        "fact_employee",
        spark.createDataFrame(
            [], "employee_id string, time_id int, salary decimal(12,2), status string"
        ),
    )
    fact_employee = fact_employee_prior.unionByName(
        incremental_fact_insert(fact_employee_prior, snapshot_batch)
    )

    # Expense fact (ref B3_load_fin_facts.sql:67-126): orphan FKs DQ'd and
    # dropped by the inner dim join; full-row NOT EXISTS dedup.
    fk_dq = dq_issues(
        fin_clean.join(emp_current, on="employee_id", how="left_anti"),
        "fact_expenses", "employee_id", "employee_id",
        F.lit(True), "unmatched employee FK dropped",
    )
    expense_batch = (
        fin_clean.join(emp_current.select("employee_id"), on="employee_id")
        .join(
            F.broadcast(dim_expense_type),
            fin_clean.expense_type == F.col("expense_type_name"),
        )
        .join(
            F.broadcast(dim_time.select("time_id", "full_date")),
            fin_clean.expense_date == F.col("full_date"),
        )
        .select(
            "employee_id", "expense_type_id", "expense_amount",
            "approved_by", "time_id", "is_refund",
        )
    )
    fact_expenses_prior = prior.get(
        "fact_expenses",
        spark.createDataFrame(
            [],
            "employee_id string, expense_type_id int, expense_amount decimal(12,2), "
            "approved_by string, time_id int, is_refund boolean",
        ),
    )
    fact_expenses = fact_expenses_prior.unionByName(
        incremental_fact_insert(fact_expenses_prior, expense_batch)
    )

    # Downtime fact (ref C3_load_dim_ops.sql:71-122)
    downtime_batch = (
        ops_clean.join(
            F.broadcast(dim_department),
            ops_clean.department == F.col("department_name"),
        )
        .join(F.broadcast(dim_process), on="process_name")
        .join(
            F.broadcast(dim_location),
            ops_clean.location == F.col("location_name"),
        )
        .join(
            F.broadcast(dim_time.select("time_id", "full_date")),
            ops_clean.process_date == F.col("full_date"),
        )
        .select(
            "department_id", "process_id", "location_id", "time_id",
            F.col("downtime_hours").cast("decimal(10,2)").alias("downtime_hours"),
        )
    )
    fact_downtime_prior = prior.get(
        "fact_downtime",
        spark.createDataFrame(
            [],
            "department_id int, process_id int, location_id int, time_id int, "
            "downtime_hours decimal(10,2)",
        ),
    )
    fact_downtime = fact_downtime_prior.unionByName(
        incremental_fact_insert(fact_downtime_prior, downtime_batch)
    )

    audit = (
        audit_frame(hr_clean, "dim_employee", "load", F.col("date_of_joining").isNull())
        .unionByName(
            audit_frame(
                fin_clean, "fact_expenses", "load",
                F.col("expense_date").isNull() | F.col("expense_amount").isNull(),
            )
        )
        .unionByName(
            audit_frame(ops_clean, "fact_downtime", "load", F.col("downtime_hours").isNull())
        )
    )

    return {
        "dim_department": dim_department,
        "dim_expense_type": dim_expense_type,
        "dim_process": dim_process,
        "dim_location": dim_location,
        "dim_employee": dim_employee,
        "dim_time": dim_time,
        "fact_employee": fact_employee,
        "fact_expenses": fact_expenses,
        "fact_downtime": fact_downtime,
        "fk_dq": fk_dq,
        "audit": audit,
    }


def run_etl(
    spark: SparkSession,
    hr_raw: DataFrame,
    fin_raw: DataFrame,
    ops_raw: DataFrame,
    load_date: str,
    prior: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """The full ``ET_combined.py`` + ``TL_combine.sql`` flow in one call:
    clean all three domains (collecting DQ), load the warehouse, and
    return state + logs."""
    hr, hr_dq = clean_hr(hr_raw)
    fin, fin_dq = clean_finance(fin_raw)
    ops, ops_dq = clean_ops(ops_raw)
    state = load_warehouse(spark, hr, fin, ops, load_date, prior)
    state["dq"] = union_dq(hr_dq, fin_dq, ops_dq, state.pop("fk_dq"))
    return state
