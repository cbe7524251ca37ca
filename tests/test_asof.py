"""As-of join: window formulation ≡ pandas merge_asof formulation, plus
edge semantics (equal-ts visibility, no-right-match → NULL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators import asof as ao
from data_warehousing_assignment_spark.registry import t
from tests.conftest import SF_SMALL

LEFT = [
    (1, "u1", 100),
    (2, "u1", 200),
    (3, "u1", 50),   # before any right row
    (4, "u2", 100),  # u2 has no right rows at all
]
RIGHT = [
    ("u1", 100, 10.0),  # equal ts to left id=1 → visible
    ("u1", 150, 20.0),
]


def test_asof_semantics(spark):
    left = spark.createDataFrame(LEFT, "event_id int, user_id string, ts long")
    right = spark.createDataFrame(RIGHT, "user_id string, ts long, value double")
    out = {
        r.event_id: r.value_asof
        for r in ao.asof_join(left, right, "ts", ["user_id"], ["value"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None, 4: None}


def test_window_and_pandas_variants_agree(spark):
    ev = t(spark, SF_SMALL, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_ns"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ns", "value"
    )
    fast = ao.asof_join(views, purchases, "ts_ns", ["user_id"], ["value"])
    ref = ao.asof_join_pandas(views, purchases, "ts_ns", ["user_id"], ["value"])
    canon = lambda df: sorted(map(tuple, df.collect()), key=repr)
    assert canon(fast) == canon(ref)
    assert fast.count() == views.count()  # left join: all left rows kept
