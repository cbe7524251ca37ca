"""Date/dim_time tests: spine bounds, Postgres-DOW weekend semantics,
regex-dispatch date parsing (dbt date_safe macro)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.functions import dates as d


def test_date_spine_bounds_and_fallback(spark):
    spine = d.date_spine(spark, "2024-01-01", "2024-01-10")
    days = sorted(r.full_date for r in spine.collect())
    assert days[0] == dt.date(1957, 1, 1)  # fallback row unioned in
    assert days[1] == dt.date(2024, 1, 1)
    assert days[-1] == dt.date(2024, 1, 10)
    assert len(days) == 11
    # union is DISTINCT: fallback inside the range doesn't duplicate
    spine2 = d.date_spine(spark, "1957-01-01", "1957-01-02")
    assert spine2.count() == 2


def test_weekend_flag_postgres_dow(spark):
    # 2024-01-06 Sat, 2024-01-07 Sun, 2024-01-08 Mon
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 6),), (dt.date(2024, 1, 7),), (dt.date(2024, 1, 8),)],
        "full_date date",
    )
    out = {r.full_date: r.is_weekend for r in d.with_calendar_parts(df, "full_date").collect()}
    assert out[dt.date(2024, 1, 6)] is True
    assert out[dt.date(2024, 1, 7)] is True
    assert out[dt.date(2024, 1, 8)] is False


def test_build_dim_time_surrogate_keys_sequential(spark):
    dim = d.build_dim_time(spark, "2024-01-01", "2024-01-05", fallback=None)
    rows = sorted(dim.collect(), key=lambda r: r.time_id)
    assert [r.time_id for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].full_date == dt.date(2024, 1, 1)


def test_date_safe_dispatch_by_shape(spark):
    df = spark.createDataFrame(
        [("2018-01-15",), ("15-01-2018",), ("01-13-2018",), ("garbage",)],
        "x string",
    )
    out = [r.o for r in df.select(d.date_safe_dispatch("x").alias("o")).collect()]
    assert out[0] == dt.date(2018, 1, 15)
    assert out[1] == dt.date(2018, 1, 15)
    # shape says dd-MM-yyyy but month 13 can't parse → try_to_date NULL
    assert out[2] is None
    assert out[3] == dt.date(1957, 1, 1)


def test_pg_day_of_week(spark):
    df = spark.createDataFrame([(dt.date(2024, 1, 7),)], "x date")  # Sunday
    assert df.select(d.pg_day_of_week("x").alias("dow")).first().dow == 0
