"""Scoped cache lifecycle for operator-internal persists.

Several operators persist an intermediate frame that is consumed more
than once within one logical query (LSH band keys, Jaccard shingle
arrays, IVF cell lists). The operator cannot unpersist it itself — the
returned DataFrame is still lazy and the cached frame is only read when
the CALLER materializes the result. Leaving the persist unreleased is
fine for one-shot jobs but pins executor storage across a long-lived
session (bench loops, registry sweeps, notebooks).

``pin(df)`` is therefore persist-with-ambient-ownership: inside a
``cache_scope()`` block the persist is registered with the scope and
released (blocking) when the block exits; outside any scope it degrades
to a plain ``persist()`` exactly as before. Scopes nest (LIFO), so a
pipeline can hold a coarse outer scope while an inner operator releases
its own scratch caches early.

At 100 TB the same discipline matters more, not less: a leaked
MEMORY_AND_DISK frame evicts useful shuffle/broadcast blocks long after
its query finished.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_SCOPES: list[list[DataFrame]] = []


def pin(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default), handing ownership to
    the innermost active :func:`cache_scope` if one exists."""
    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Release every ``pin()`` made inside the block on exit (also on
    error). Unpersist is blocking so tests can assert storage is clean
    immediately after the block."""
    held: list[DataFrame] = []
    _SCOPES.append(held)
    try:
        yield held
    finally:
        _SCOPES.pop()
        for df in held:
            try:
                df.unpersist(blocking=True)
            except Exception:
                pass  # session already stopped — nothing to release


def cached_rdd_count(spark) -> int:
    """Number of RDDs currently marked persistent in the context —
    the assertion hook for cache-hygiene tests."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()
