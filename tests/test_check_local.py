"""Pin the semantics of tools/check_local.py's DuckDB multiset compare.

The sf1 oracle sweep (BASELINE.md round 9) relies on ``compare_big`` for
results larger than BIG_ROWS, so its equivalence to the per-cell Python
canonicalizer (``canon_df``) is load-bearing evidence: NaN folds to NULL,
floats compare bitwise-exact after widening to DOUBLE, ints widen to
BIGINT, set ops are multiset (duplicate-count-sensitive), and NULL==NULL.
No Spark session needed — pure pandas/DuckDB.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from check_local import canon_df, compare_big  # noqa: E402


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _frame():
    return pd.DataFrame(
        {
            "a": [1, 2, None],
            "b": [1.5, float("nan"), 2.0],
            "c": ["x", "y", None],
            "d": pd.to_datetime(["2020-01-01", "2020-01-02", None]),
            "e": [[1, 2], [3], None],
        }
    )


def test_identical_shuffled_rows_equal(con):
    s = _frame()
    o = s.iloc[[2, 0, 1]].reset_index(drop=True)
    ok, msg = compare_big(con, s, o)
    assert ok, msg


def test_float_ulp_difference_caught(con):
    s = _frame()
    o = s.copy()
    o.loc[0, "b"] = 1.5 + 2**-40
    ok, _ = compare_big(con, s, o)
    assert not ok


def test_nan_equals_null_like_canon_cell(con):
    # canon_cell maps float NaN to the "<NULL>" sentinel; the DuckDB
    # path must agree (isnan -> NULL before the set op).
    s = _frame()
    o = s.copy()
    o["b"] = [1.5, None, 2.0]
    ok, msg = compare_big(con, s, o)
    assert ok, msg


def test_int_widen_to_double_matches(con):
    ok, msg = compare_big(
        con, pd.DataFrame({"x": [1, 2]}), pd.DataFrame({"x": [1.0, 2.0]})
    )
    assert ok, msg


def test_multiset_duplicate_counts_enforced(con):
    ok, _ = compare_big(
        con, pd.DataFrame({"x": [1, 1, 2]}), pd.DataFrame({"x": [1, 2, 2]})
    )
    assert not ok


def test_list_column_compared_by_value(con):
    s = pd.DataFrame({"e": [[1, 2], [3]]})
    o = pd.DataFrame({"e": [[3], [1, 2]]})
    ok, msg = compare_big(con, s, o)
    assert ok, msg
    bad = pd.DataFrame({"e": [[1, 2], [4]]})
    ok, _ = compare_big(con, s, bad)
    assert not ok


def test_agrees_with_canon_df_verdict(con):
    # Both paths must return the same verdict on the same pair.
    s = _frame()
    o = s.iloc[[1, 2, 0]].reset_index(drop=True)
    scols, srows = canon_df(s)
    ocols, orows = canon_df(o)
    assert (scols, srows) == (ocols, orows)
    ok, msg = compare_big(con, s, o)
    assert ok, msg
