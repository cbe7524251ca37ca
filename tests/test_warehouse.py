"""Golden end-to-end warehouse test on dirty-fixture replicas
(FIXTURES.md): every dirt pattern the reference's fixtures exercise, the
SCD2 day-2 batch, and incremental idempotency."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.plans import warehouse as wh

HR_COLS = "EmployeeID string, Name string, Department string, Gender string, DateOfJoining string, ManagerID string, Salary string, Status string"
HR_ROWS = [
    ("1001", "Alice", "IT", "F", "2018-01-15", "2001", "55000", "Active"),
    ("1001", "Alice", "IT", "F", "2018-01-15", "2001", "55000", "Active"),  # exact dup
    ("1002", "Bob", "It", "m", "15-01-2018", "2003.0", "-10000", "Active"),  # case/dayfirst/float-str/negative
    ("1003", "", "", "MALE", "2019-03-01", "", "61000", "resigned"),  # blanks
    ("", "Dana", "HR", "x", "not-a-date", "2001", "oops", "whatever"),  # missing id, junk
]
FIN_COLS = "EmployeeID string, ExpenseType string, ExpenseAmount string, ExpenseDate string, ApprovedBy string"
FIN_ROWS = [
    ("1001", "Travell", "120.50", "2024-01-10", "2001"),
    ("1002", "meals", "-50.75", "2024-01-11", "2002.0"),  # refund + float-str approver
    ("9999", "Supplies", "10.00", "2024-01-12", "2001"),  # orphan FK
    ("1003", "", "30.00", "2025-12-31", ""),  # blank type, future date, blank approver
]
OPS_COLS = "Department string, ProcessName string, DowntimeHours string, ProcessDate string, Location string"
OPS_ROWS = [
    ("IT", "Backup", "2.5", "2024-01-10", "HQ"),
    ("IT", "Backup", "", "2024-01-11", "HQ"),  # missing hours → group mean 2.5
    ("Legal", "Audit", "4.0", "bad-date", "Remot Site A"),  # 1957 fallback + typo location kept
    ("", "", "1.0", "2024-01-12", "Warehouse"),  # blank dept/process
]

LOAD_DATE = "2024-02-01"


@pytest.fixture(scope="module")
def state(spark):
    hr = spark.createDataFrame(HR_ROWS, HR_COLS)
    fin = spark.createDataFrame(FIN_ROWS, FIN_COLS)
    ops = spark.createDataFrame(OPS_ROWS, OPS_COLS)
    return wh.run_etl(spark, hr, fin, ops, LOAD_DATE)


def test_hr_cleaning_golden(spark, state):
    emp = {r.employee_id: r for r in state["dim_employee"].collect()}
    assert len(emp) == 4  # dup dropped, TEMP id fabricated
    assert emp["1001"].department == "IT"
    assert emp["1002"].department == "IT"  # 'It' normalized
    assert emp["1002"].gender == "M"
    assert emp["1002"].manager_id == "2003"  # float-string stripped
    assert emp["1002"].date_of_joining == dt.date(2018, 1, 15)  # day-first
    assert emp["1003"].name == "EMP_1003"  # blank name fallback
    assert emp["1003"].department == "UNASSIGNED_DEPT"
    temp = [k for k in emp if k.startswith("TEMP_")]
    assert len(temp) == 1  # missing EmployeeID fabricated
    assert emp[temp[0]].gender == "UNKNOWN"
    assert emp[temp[0]].date_of_joining is None  # HR fallback = NULL


def test_salary_abs_and_status_whitelist(spark, state):
    snap = {r.employee_id: r for r in state["fact_employee"].collect()}
    assert float(snap["1002"].salary) == 10000.0  # abs repair
    assert snap["1003"].status == "Resigned"
    temp = [k for k in snap if k.startswith("TEMP_")]
    assert snap[temp[0]].status == "Unknown"
    assert snap[temp[0]].salary is None  # 'oops' coerced to NULL


def test_dims_conformed(spark, state):
    depts = {r.department_name for r in state["dim_department"].collect()}
    # HR ∪ Ops members incl. LEGAL (ops-only) and UNASSIGNED_DEPT
    assert {"IT", "HR", "LEGAL", "UNASSIGNED_DEPT"} <= depts
    locs = {r.location_name for r in state["dim_location"].collect()}
    assert "Remot Site A" in locs  # typo NOT fuzzy-fixed (reference behavior)
    procs = {r.process_name for r in state["dim_process"].collect()}
    assert "UNKNOWN_PROCESS" in procs
    types = {r.expense_type_name for r in state["dim_expense_type"].collect()}
    assert types == {"Travel", "Meals", "Supplies", "Unknown"}  # typo fixed, title-cased


def test_expense_fact_orphan_dropped_and_logged(spark, state):
    fact = state["fact_expenses"].collect()
    assert len(fact) == 3  # orphan 9999 excluded
    dq = state["dq"].filter(F.col("issue").contains("unmatched employee FK")).collect()
    assert [r.row_reference for r in dq] == ["9999"]
    refunds = [r for r in fact if r.is_refund]
    assert len(refunds) == 1 and float(refunds[0].expense_amount) == -50.75


def test_downtime_imputation_and_date_fallback(spark, state):
    fact = state["fact_downtime"].collect()
    assert all(r.downtime_hours is not None for r in fact)
    assert sorted(float(r.downtime_hours) for r in fact) == [1.0, 2.5, 2.5, 4.0]
    time_ids = {r.time_id for r in fact}
    dim_time = {r.time_id: r.full_date for r in state["dim_time"].collect()}
    assert dt.date(1957, 1, 1) in {dim_time[t] for t in time_ids}  # fallback row used


def test_dq_log_covers_all_domains(spark, state):
    issues = {r.issue for r in state["dq"].collect()}
    assert "exact duplicate rows dropped" in issues
    assert "invalid gender set to UNKNOWN" in issues
    assert "negative salary repaired with abs()" in issues
    assert "missing downtime imputed" in issues
    assert "negative amount flagged as refund" in issues


def test_audit_statuses(spark, state):
    audit = {r.table_name: r for r in state["audit"].collect()}
    assert audit["dim_employee"].status == "partial"  # one NULL joining date
    assert audit["dim_employee"].rows_processed == 4
    assert audit["fact_downtime"].status == "success"  # imputation fixed all


def test_scd2_day2_and_idempotency(spark, state):
    # day 2: same batch again → SCD2 no-op AND facts unchanged
    hr = spark.createDataFrame(HR_ROWS, HR_COLS)
    fin = spark.createDataFrame(FIN_ROWS, FIN_COLS)
    ops = spark.createDataFrame(OPS_ROWS, OPS_COLS)
    # hash-fabricated TEMP ids are stable across runs, so the FULL batch
    # (fabricated row included) reruns as a no-op
    state2 = wh.run_etl(spark, hr, fin, ops, "2024-02-02", prior=state)
    cur = state2["dim_employee"].filter(F.col("is_current"))
    assert cur.count() == 4
    # unchanged rows keep their original valid_from
    assert (
        cur.filter(F.col("employee_id") == "1001").first().valid_from
        == dt.date(2024, 2, 1)
    )
    assert state2["fact_expenses"].count() == 3  # no duplicate fact rows
    assert state2["fact_downtime"].count() == 4

    # day 3: 1002 changes department → expire + insert
    hr3_rows = [
        ("1001", "Alice", "IT", "F", "2018-01-15", "2001", "55000", "Active"),
        ("1002", "Bob", "Finance", "M", "2018-01-15", "2003", "10000", "Active"),
        ("1003", "", "", "MALE", "2019-03-01", "", "61000", "resigned"),
    ]
    state3 = wh.run_etl(
        spark, spark.createDataFrame(hr3_rows, HR_COLS), fin, ops,
        "2024-02-03", prior=state2,
    )
    e1002 = state3["dim_employee"].filter(F.col("employee_id") == "1002").collect()
    by_cur = {r.is_current: r for r in e1002}
    assert len(e1002) == 2
    assert by_cur[False].valid_to == dt.date(2024, 2, 3)
    assert by_cur[True].department == "FINANCE"
    assert by_cur[True].valid_from == dt.date(2024, 2, 3)
