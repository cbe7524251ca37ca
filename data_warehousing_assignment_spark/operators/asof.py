"""As-of (point-in-time) join — a custom operator Spark lacks natively
(extension surface, SURVEY.md §7.5; no reference counterpart).

For every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group — the canonical
"latest dimension state at event time" lookup of feature pipelines.

Two implementations with identical semantics:

* :func:`asof_join` — pure DataFrame: tag + union + one window
  ``last(value, ignorenulls)`` pass. ONE shuffle on (key, ts) total,
  entirely JVM-side; the right implementation at 100 TB.
* :func:`asof_join_pandas` — ``cogroup().applyInPandas`` over
  ``pd.merge_asof``: the escape hatch shape for semantics the window
  trick can't express (nearest-in-either-direction, tolerance bands).
  Costs Arrow transfer of both sides; kept as the reference
  implementation the fast path is tested against.

Ties: a right row at exactly ``left.ts`` IS visible (<= semantics, the
pandas/DuckDB ``ASOF JOIN`` default — backward direction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

ASOF_SUFFIX = "_asof"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join, window formulation: union right rows (tagged
    0) under left rows (tagged 1), then per key in (ts, tag) order carry
    the last non-null right value forward. Right-at-equal-ts sorts before
    left, giving <= semantics. Output = left columns + one
    ``<value>_asof`` per value column."""
    renamed = [F.col(v).alias(v + ASOF_SUFFIX) for v in value_cols]
    r = right.select(*by_cols, ts_col, *renamed).withColumn("_asof_tag", F.lit(0))
    l = left.withColumn("_asof_tag", F.lit(1))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    for v in value_cols:
        l = l.withColumn(v + ASOF_SUFFIX, F.lit(None).cast(dict(right.dtypes)[v]))
    unioned = l.unionByName(r.select(*l.columns))

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(ts_col, "_asof_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in l.columns if not c.endswith(ASOF_SUFFIX) and c != "_asof_tag"],
        "_asof_tag",
        *[
            F.last(v + ASOF_SUFFIX, ignorenulls=True).over(w).alias(v + ASOF_SUFFIX)
            for v in value_cols
        ],
    )
    return carried.filter(F.col("_asof_tag") == 1).drop("_asof_tag")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Reference implementation via cogrouped ``pd.merge_asof`` (each key
    group merges in pandas; Arrow moves both sides). Same output contract
    as :func:`asof_join`."""
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(v + ASOF_SUFFIX, right.schema[v].dataType)
            for v in value_cols
        ]
    )
    left_cols = list(left.columns)
    r_keep = [ts_col, *value_cols]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(ts_col, kind="mergesort")
        if len(r) == 0:
            for v in value_cols:
                l[v + ASOF_SUFFIX] = None
            return l[left_cols + [v + ASOF_SUFFIX for v in value_cols]]
        r = r[r_keep].sort_values(ts_col, kind="mergesort")
        r = r.rename(columns={v: v + ASOF_SUFFIX for v in value_cols})
        merged = pd.merge_asof(l, r, on=ts_col, direction="backward")
        return merged[left_cols + [v + ASOF_SUFFIX for v in value_cols]]

    return (
        left.groupby(*by_cols)
        .cogroup(right.groupby(*by_cols))
        .applyInPandas(merge, out_schema)
    )
