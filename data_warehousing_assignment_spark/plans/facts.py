"""Incremental fact load with dedup + snapshot fact.

Reference: candidate rows = staging ⋈ dims, insert candidates not already
present via correlated NOT EXISTS over every measure+FK (ref
``03_load_into_fact_and_dim_tables/B3_load_fin_facts.sql:67-126``,
``C3_load_dim_ops.sql:71-122``); the dbt variant adds a watermark filter
``t.full_date > (SELECT max(full_date) FROM this)`` (ref
``05_dbt_implementation/.../models/facts/fact_expenses.sql:39-45``).

Scale design (SURVEY.md §4): the reference re-scans the ENTIRE fact per
batch — O(|fact|) per load. Here the anti-join is preceded by a
partition prune: the existing side is filtered to the batch's own date
window first, so at 100 TB (fact partitioned by date on disk) the
anti-join shuffles only the overlap days, not years of history.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators.joins import (
    not_exists_all_columns,
    scalar_subquery,
)


def incremental_fact_insert(
    existing: DataFrame,
    batch: DataFrame,
    dedup_cols: list[str] | None = None,
    date_col: str | None = None,
) -> DataFrame:
    """Rows of ``batch`` to append: those with no existing row matching on
    ``dedup_cols`` (default: all columns — the reference's full-row NOT
    EXISTS).

    When ``date_col`` is given, ``existing`` is pre-pruned to the batch's
    [min, max] date window — the partition-prune wrapper the reference
    lacks. The min/max scalar collect is 1 row and prunes the fact scan,
    the one legitimate driver-side value (see joins.scalar_subquery).

    CORRECTNESS PRECONDITION for the prune: ``date_col`` must be part of
    the dedup key (it is in the reference — its NOT EXISTS compares
    time_id too, ``B3_load_fin_facts.sql:84-94``). Otherwise a batch row
    could duplicate an existing row dated OUTSIDE the window and the
    prune would wrongly resurrect it.
    """
    if date_col is not None and dedup_cols is not None and date_col not in dedup_cols:
        raise ValueError(
            "date-window prune requires date_col in dedup_cols "
            "(otherwise the prune changes dedup semantics)"
        )
    if date_col is not None:
        lo = scalar_subquery(batch, F.min(date_col))
        hi = scalar_subquery(batch, F.max(date_col))
        if lo is not None:
            existing = existing.filter(
                (F.col(date_col) >= F.lit(lo)) & (F.col(date_col) <= F.lit(hi))
            )
    return not_exists_all_columns(
        batch, existing.select(*batch.columns), dedup_cols
    )


def watermark_filter(
    batch: DataFrame, existing: DataFrame, date_col: str
) -> DataFrame:
    """dbt-style incremental watermark (ref ``fact_expenses.sql:39-45``):
    keep only batch rows strictly newer than max(date) already loaded.
    Cheaper than full-row dedup when loads are strictly append-ordered."""
    wm = scalar_subquery(existing, F.max(date_col))
    if wm is None:
        return batch
    return batch.filter(F.col(date_col) > F.lit(wm))


def snapshot_fact(
    dim_current: DataFrame,
    time_dim: DataFrame,
    snapshot_date,
    date_col: str = "full_date",
) -> DataFrame:
    """Daily snapshot fact (ref ``A3_load_dim_emp.sql:85-95``): current dim
    rows × the single time row for the snapshot date. The 1-row time side
    broadcasts — the dim never shuffles.

    Note reference quirk Q4: the reference's snapshot has NO dedup guard
    (re-running same-day double-inserts); callers here pair this with
    incremental_fact_insert for idempotency.
    """
    today_row = time_dim.filter(F.col(date_col) == F.lit(snapshot_date))
    return dim_current.crossJoin(F.broadcast(today_row))
