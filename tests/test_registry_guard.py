"""Registry-level output-surface guard.

The driver's correctness gate canonicalizes query output through a pandas
sort/hash that cannot handle container cells — round 3 proved it: two
oracle-backed queries returning ``array<...>`` columns came back
``err: unhashable type: 'list'`` despite correct math. This test pins the
contract once for every oracle-backed query: the RESULT SCHEMA crosses
the boundary with atomic types only (arrays/structs/maps/binary must be
stringified or hashed at the query boundary — the array-native operators
underneath stay unchanged and keep their own pytest coverage).

Building the DataFrame resolves the full schema without running a job,
so this sweeps all ~100 oracle-backed queries in seconds (the handful of
IO queries that eagerly round-trip a scratch write stay cheap at
sf0.001).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

from data_warehousing_assignment_spark.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL

_CONTAINER = (ArrayType, MapType, StructType, BinaryType)


def _oracle_backed():
    qs = all_queries()
    return [(name, qs[name]) for name in all_oracles()]


@pytest.mark.parametrize(
    "name,fn", _oracle_backed(), ids=[n for n, _ in _oracle_backed()]
)
def test_oracle_query_schema_is_scalar_only(spark, name, fn):
    df = fn(spark, SF_SMALL)
    offenders = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _CONTAINER)
    ]
    assert not offenders, (
        f"{name} returns container-typed columns {offenders} — the driver's "
        "pandas canonicalization errors on these; stringify/hash them at "
        "the query boundary (keep the array-native operator internal)"
    )


def test_rows_only_set_is_exactly_the_documented_two():
    """Every registered query carries a DuckDB oracle EXCEPT the two
    with a structural reason (r9 floor): dp-counts (JVM vs libm ln
    differs in the last ulp — measured), mllib-minhash (independence
    cross-check; an oracle would defeat it). kcore left the set in r9 —
    its peel unrolls to a bounded SQL cascade
    (registry_sketch._kcore_oracle); fn-uuid left in r11 — its VALUES
    are nondeterministic but its STRUCTURE (count, distinctness,
    RFC-4122 shape) is oracle-predictable, so it returns the structural
    summary; bpe-learn left in r13 the same way (round-1 argmax is
    VALUE-exact in SQL; contiguity/monotonicity/closure are predicted
    invariants — registry_advanced.op_ext_bpe_learn). A new query
    landing without an oracle, or an oracle being silently dropped,
    must be a deliberate decision — this test forces the
    conversation."""
    import __spark_entry__ as e

    rows_only = set(e.queries()) - set(e.oracle_sql())
    assert rows_only == {
        "op-ext-dp-counts",
        "op-ext-mllib-minhash",
    }, rows_only
