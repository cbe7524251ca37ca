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
from data_warehousing_assignment_spark.operators.dedup import (
    duplicate_rows,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from data_warehousing_assignment_spark.operators.similarity import (
    brute_force_cosine_topk,
    cosine_similarity_col,
    lsh_cosine_topk,
)

__all__ = [
    "anti_join",
    "case_insensitive_join",
    "not_exists_all_columns",
    "scalar_subquery",
    "duplicate_rows",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "brute_force_cosine_topk",
    "cosine_similarity_col",
    "lsh_cosine_topk",
]
