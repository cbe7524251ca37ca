"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real work lives in ``data_warehousing_assignment_spark``; this module
only re-exports the registry dicts and the flagship query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehousing_assignment_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 4-dim star join with
    monthly revenue (SURVEY.md §7.2.1, re-expressing the reference's
    'gross monthly expenses by department and type' KPI, ref
    ``04_KPI/KPIs.sql:43-57``, on the TPC-H-ish testdata)."""
    from data_warehousing_assignment_spark.registry_core import op_join_inner_star

    return op_join_inner_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the 100 TB
    LLM-pipeline extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame; every computed column is aliased identically in
    the Spark plan and the oracle SQL."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key (omitted
    only for genuinely nondeterministic/non-SQL ops → rows-only check)."""
    return registry.all_oracles()
