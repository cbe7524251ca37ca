"""Demonstrative UDF surface (SURVEY.md §2.10): the reference cleans with
row-level pandas lambdas; our engine uses built-in Column expressions.
This test implements ONE cleaner both ways — Arrow-batched pandas UDF vs
native — and pins them equal. The native version stays the hot-path
choice: it runs inside JVM whole-stage codegen, while the UDF pays the
Arrow boundary (acceptable; row-at-a-time ``@F.udf`` would be the truly
slow third option)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_warehousing_assignment_spark.functions import cleaning as cl


def test_pandas_udf_matches_native_column(spark):
    # defined inside the test: pandas_udf registration needs a live session
    @pandas_udf("string")
    def whitelist_status_udf(s: pd.Series) -> pd.Series:
        """Pandas-UDF twin of cl.whitelist(..., STATUS_MAP, 'Unknown') —
        vectorized per Arrow batch (ref A2_hr_etl.py:66-68 semantics)."""
        norm = s.str.strip().str.upper()
        return norm.map({"ACTIVE": "Active", "RESIGNED": "Resigned"}).fillna("Unknown")

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(["active", " RESIGNED ", "Active", "wat", "", "nan"])],
        "id int, status string",
    )
    native = cl.whitelist(
        "status", {"ACTIVE": "Active", "RESIGNED": "Resigned"}, "Unknown"
    )
    out = df.select(
        "id",
        native.alias("native"),
        whitelist_status_udf("status").alias("udf"),
    ).collect()
    for r in out:
        assert r.native == r.udf, r
