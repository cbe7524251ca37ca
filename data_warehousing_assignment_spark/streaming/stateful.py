"""Custom stateful streaming operator via ``applyInPandasWithState``
(extension surface, SURVEY.md §7.5 — the reference has no streaming).

Operator: per-user running totals with burst detection — keeps (count,
value sum, max single micro-batch count) as group state across
micro-batches and emits one row per (user, batch) update. The same
semantics run in batch mode through :func:`user_totals_batch` and the
two are asserted equal on the final state (tests/test_stateful.py) —
the Structured Streaming correctness contract.

Scale notes: state is keyed by user_id and lives in the state store —
per-key size here is 3 numbers, so state growth is O(distinct users),
and a production deployment would add state TTL
(``GroupStateTimeout.ProcessingTimeTimeout``) to bound it. The grouping
shuffle is the same one the batch aggregate pays.

Successor API: Spark 4's ``transformWithStateInPandas`` (typed state
variables, timers, TTL) is the upgrade path for this operator, but its
Python worker requires ``google.protobuf``, absent in this
environment — probed each round via
:func:`transform_with_state_available` (re-checked r8: still absent;
tests/test_stateful.py carries a skip-gated smoke test that activates
the moment the dependency appears). The ``applyInPandasWithState``
formulation below is API-stable in 4.x and semantically equivalent for
this operator's needs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_batch", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_batch", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, max_batch = (
        state.get if state.exists else (0, 0.0, 0)
    )
    batch_n = 0
    for pdf in batches:
        batch_n += len(pdf)
        # exact 2-dp money semantics: sum in integer cents
        total += float(pdf["value"].mul(100).round().sum()) / 100.0
    n += batch_n
    max_batch = max(max_batch, batch_n)
    state.update((n, total, max_batch))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_batch": [max_batch],
        }
    )


def _update_single_batch(key: tuple[Any, ...], pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch twin of _update: one group = one batch, fresh state."""
    n = len(pdf)
    total = float(pdf["value"].mul(100).round().sum()) / 100.0
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_batch": [n],
        }
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Running per-user totals as a custom stateful operator. On a stream
    each micro-batch updates the group state and emits the new running
    totals. ``applyInPandasWithState`` is streaming-only, so a static
    frame takes the ``applyInPandas`` twin (one batch, fresh state) —
    identical output contract, which is what the parity test pins."""
    grouped = events.select("user_id", "value").groupBy("user_id")
    if not events.isStreaming:
        return grouped.applyInPandas(_update_single_batch, OUTPUT_SCHEMA)
    return grouped.applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch-mode ground truth for the stateful operator's final state
    (decimal-exact sum, like the state's integer-cents accumulation)."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def transform_with_state_available() -> bool:
    """Feasibility probe for the transformWithStateInPandas successor
    API: its worker protocol is protobuf-serialized, so the Python
    side hard-requires google.protobuf. Returns False (with no import
    side effects) in environments where the API cannot run."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return hasattr(
        __import__("pyspark.sql", fromlist=["GroupedData"]).GroupedData,
        "transformWithStateInPandas",
    )
