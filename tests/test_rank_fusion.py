"""Reciprocal-rank fusion: output contract + fusion semantics (a
candidate ranked by BOTH lists must outscore one the second list
dropped, when their best single-list ranks are equal)."""

from __future__ import annotations

from data_warehousing_assignment_spark.registry_extensions import (
    op_ext_rank_fusion,
)
from tests.conftest import SF_SMALL


def test_rank_fusion_contract(spark):
    rows = op_ext_rank_fusion(spark, SF_SMALL).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    max_single = 1_000_000 // 61  # best possible one-list contribution
    for q, rs in by_q.items():
        ranks = sorted(x.fused_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        # fused ordering is by rrf_micro desc
        srt = sorted(rs, key=lambda x: x.fused_rank)
        scores = [x.rrf_micro for x in srt]
        assert scores == sorted(scores, reverse=True)
        # two-list membership dominates: every score is within the
        # arithmetic bounds of 1..2 contributions
        for x in rs:
            assert 1_000_000 // (60 + 20) <= x.rrf_micro <= 2 * max_single
    # the top fused hit for at least one query must combine two lists
    # (score above the single-list maximum) — cosine and dot agree on
    # the strongest neighbors, so fusion actually fuses
    assert any(
        max(x.rrf_micro for x in rs) > max_single for rs in by_q.values()
    )


def test_hybrid_fusion_contract(spark):
    """Hybrid BM25×IVF fusion (r12 verdict #6): output contract plus the
    cross-modal property — the fused list can contain neighbors only one
    modality surfaced, and two-list members outscore single-list ones at
    equal best rank."""
    from data_warehousing_assignment_spark.registry_extensions import (
        op_ext_hybrid_fusion,
    )

    rows = op_ext_hybrid_fusion(spark, SF_SMALL).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    max_single = 1_000_000 // 61
    for q, rs in by_q.items():
        ranks = sorted(x.fused_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        srt = sorted(rs, key=lambda x: x.fused_rank)
        scores = [x.rrf_micro for x in srt]
        assert scores == sorted(scores, reverse=True)
        for x in rs:
            assert x.neighbor_id != q
            # 1 or 2 contributions, each from rank 1..20
            assert 1_000_000 // 80 <= x.rrf_micro <= 2 * max_single
    # the lexical and dense rankers disagree somewhere: at least one
    # fused hit rides a single list (score ≤ one-list max) and at least
    # one combines both (score > one-list max)
    flat = [x.rrf_micro for rs in by_q.values() for x in rs]
    assert any(s > max_single for s in flat)
    assert any(s <= max_single for s in flat)
