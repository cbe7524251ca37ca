"""Stdlib xlsx reader/writer: round-trip fidelity on dirty-HR-shaped
data, sparse-cell placement, and — when the reference checkout is
present — cell-for-cell parity with the REAL ``HR_Dataset_Dirty.xlsx``
(ref ``A2_hr_etl.py:14``) against its committed CSV twin."""

from __future__ import annotations

import csv
import os

import pytest

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from data_warehousing_assignment_spark.sources.xlsx import (
    read_excel,
    read_xlsx_rows,
    write_xlsx,
)

_REF_XLSX = "/root/reference/HR_Dataset_Dirty.xlsx"
_REF_CSV = (
    "/root/reference/05_dbt_implementation/dbt_warehouse_project/"
    "seeds/raw/HR_Dataset_Dirty.csv"
)

_HR_HEADER = [
    "EmployeeID", "Name", "Department", "Gender",
    "DateOfJoining", "ManagerID", "Salary", "Status",
]

#: dirty-HR-shaped fixture (FIXTURES.md §1 dirt patterns): missing id,
#: blank name, mixed-case dept, gender variants, mixed date formats,
#: float-string manager, negative salary, exact duplicate row.
_HR_DIRTY = [
    [1001, "Employee 1001", "IT", "M", "2018-10-09", 2003, 94088, "Resigned"],
    [1001, "Employee 1001", "IT", "M", "2018-10-09", 2003, 94088, "Resigned"],
    [1002, None, "It", "f", "15-01-2018", "2003.0", -10000, "ACTIVE"],
    [None, "Employee X", None, "MALE", None, None, None, "Active"],
    [1004, "A & B <quoted>", "HR", "F", "2016-01-03", 2002, 115497.5, "Active"],
]


def test_round_trip_dirty_hr(tmp_path):
    path = str(tmp_path / "hr.xlsx")
    write_xlsx(path, _HR_HEADER, _HR_DIRTY)
    header, rows = read_xlsx_rows(path)
    assert header == _HR_HEADER
    assert rows == _HR_DIRTY  # Nones, floats, negatives, xml-escapes intact


def test_sparse_rows_keep_cell_positions(tmp_path):
    path = str(tmp_path / "sparse.xlsx")
    write_xlsx(path, ["a", "b", "c"], [[1, None, 3], [None, 2, None]])
    _, rows = read_xlsx_rows(path)
    assert rows == [[1, None, 3], [None, 2, None]]


def test_read_excel_into_spark(spark, tmp_path):
    path = str(tmp_path / "hr2.xlsx")
    write_xlsx(path, _HR_HEADER, _HR_DIRTY)
    df = read_excel(spark, path)
    assert df.columns == _HR_HEADER
    assert df.count() == len(_HR_DIRTY)
    got = {r["EmployeeID"] for r in df.collect()}
    assert got == {"1001", "1002", None, "1004"}  # strings + NULL blanks

    schema = StructType(
        [StructField("EmployeeID", IntegerType()),
         StructField("Name", StringType())]
    )
    typed = read_excel(spark, path, schema=schema)
    assert [f.dataType for f in typed.schema.fields] == [
        IntegerType(), StringType()
    ]


@pytest.mark.skipif(
    not (os.path.exists(_REF_XLSX) and os.path.exists(_REF_CSV)),
    reason="reference checkout not present",
)
def test_reference_workbook_parity_with_csv_twin():
    """The reference commits the same dirty HR data as both .xlsx and a
    dbt CSV seed — reading the real workbook must reproduce the seed
    cell-for-cell (blank ↔ None, numbers stringified)."""
    header, rows = read_xlsx_rows(_REF_XLSX)
    with open(_REF_CSV, newline="") as fh:
        expect = list(csv.reader(fh))
    assert header == expect[0] == _HR_HEADER
    assert len(rows) == len(expect) - 1 == 21
    for got, want in zip(rows, expect[1:]):
        got_s = ["" if v is None else str(v) for v in got]
        assert got_s == want


def test_read_excel_empty_sheet_and_blank_column(spark, tmp_path):
    """Explicit all-string schema: zero data rows and fully-blank columns
    are well-defined (inference would raise 'can not infer schema')."""
    empty = str(tmp_path / "empty.xlsx")
    write_xlsx(empty, ["a", "b"], [])
    df = read_excel(spark, empty)
    assert df.columns == ["a", "b"]
    assert df.count() == 0
    assert all(f.dataType == StringType() for f in df.schema.fields)

    blank = str(tmp_path / "blankcol.xlsx")
    write_xlsx(blank, ["id", "hole"], [[1, None], [2, None]])
    df2 = read_excel(spark, blank)
    assert df2.count() == 2
    assert [r["hole"] for r in df2.collect()] == [None, None]


def test_sheet_name_with_quotes_round_trips(tmp_path):
    """sheet_name lands in workbook.xml's name="..." attribute — quotes
    must be escaped or the workbook XML is malformed."""
    path = str(tmp_path / "quoted.xlsx")
    name = 'Q3 "final" \'draft\' <&>'
    write_xlsx(path, ["x"], [[1]], sheet_name=name)
    header, rows = read_xlsx_rows(path, sheet=name)
    assert header == ["x"]
    assert rows == [[1]]
