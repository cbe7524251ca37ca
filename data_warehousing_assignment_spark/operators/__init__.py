"""Relational + dataflow operators (SURVEY.md §2.2-2.7) and the 100 TB
extension operators (dedup, similarity search, text analysis).

Trivial operators (project/filter/inner join/groupBy-agg/sort/limit) are
expressed directly with the DataFrame API at their call sites — wrapping
``df.filter`` in a function adds nothing and hides the plan. This package
holds the operators with real semantics: anti-join idioms, incremental
dedup, SCD2 building blocks, dedup/similarity/text extensions.
"""

from data_warehousing_assignment_spark.operators.joins import (
    anti_join,
    case_insensitive_join,
    not_exists_all_columns,
    scalar_subquery,
)

__all__ = [
    "anti_join",
    "case_insensitive_join",
    "not_exists_all_columns",
    "scalar_subquery",
]
