"""Overlapping-window chunking: the built-in HOF path (chunk_windows),
the Python UDTF surface, and the pure-python geometry twin must agree
row-for-row — including the ragged-tail and boundary document lengths
the oracle's random corpus may not cover."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.functions.chunkers import (
    OverlapChunker,
    chunk_spans,
)
from data_warehousing_assignment_spark.operators.text import (
    CHUNK_S,
    CHUNK_W,
    chunk_windows,
)
from data_warehousing_assignment_spark.registry import t
from tests.conftest import SF_SMALL


def test_geometry_boundaries():
    """Chunk count and tail length at every boundary n."""
    for n, want in (
        (1, 1),                    # tiny doc: one short chunk
        (CHUNK_W - 1, 1),
        (CHUNK_W, 1),              # exactly one full window
        (CHUNK_W + 1, 2),          # one token past → ragged second chunk
        (CHUNK_W + CHUNK_S, 2),    # second window exactly full
        (CHUNK_W + CHUNK_S + 1, 3),
        (3 * CHUNK_S + CHUNK_W, 4),
    ):
        text = " ".join(f"t{i}" for i in range(n))
        got = list(chunk_spans(text))
        assert len(got) == want, n
        # every chunk starts at i*S and is ≤ W tokens; tail is the rest
        for i, (ci, ntk, _h) in enumerate(got):
            assert ci == i
            assert ntk == min(CHUNK_W, n - i * CHUNK_S)
        # full coverage: last chunk reaches the final token
        assert got[-1][0] * CHUNK_S + got[-1][1] == n


def test_overlap_is_w_minus_s():
    n = CHUNK_W + CHUNK_S  # two full windows
    toks = [f"t{i}" for i in range(n)]
    spans = list(chunk_spans(" ".join(toks)))
    assert len(spans) == 2
    # chunk 1 covers [S, S+W) — the W-S suffix tokens of chunk 0 repeat
    import hashlib

    want = hashlib.md5(
        " ".join(toks[CHUNK_S : CHUNK_S + CHUNK_W]).encode()
    ).hexdigest()
    assert spans[1][2] == want


def test_builtin_matches_udtf_on_corpus(spark):
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    a = chunk_windows(docs).select(
        "doc_id", "chunk_idx", "n_chunk_toks", "chunk_md5"
    )
    spark.udtf.register("overlap_chunks_test", OverlapChunker)
    docs.createOrReplaceTempView("_chunk_pin_docs")
    b = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.n_chunk_toks, c.chunk_md5
           FROM _chunk_pin_docs d, LATERAL overlap_chunks_test(d.text) c"""
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_builtin_matches_python_on_adversarial_texts(spark):
    """Whitespace runs, tabs/newlines (SQL TRIM strips spaces only),
    mixed case, and single-token docs — the tokenization corners."""
    rows = [
        (1, "  leading spaces and   runs   of spaces"),
        (2, "\tTabbed\nand newlined\ttext here"),
        (3, "MiXeD CaSe TeXt"),
        (4, "one"),
        (5, " ".join(f"w{i}" for i in range(CHUNK_W + CHUNK_S + 3))),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_toks"], r["chunk_md5"])
        for r in chunk_windows(df).collect()
    }
    for doc_id, text in rows:
        for ci, ntk, h in chunk_spans(text):
            assert got[(doc_id, ci)] == (ntk, h), (doc_id, ci)
    assert len(got) == sum(len(list(chunk_spans(tx))) for _, tx in rows)


def test_null_text_drops_row_in_both_paths(spark):
    """NULL text must vanish from BOTH the HOF path (sequence(NULL)
    explode) and the UDTF (r8 review finding: a None-guard once made
    the UDTF emit a md5('') chunk for NULL while the twin dropped it)."""
    df = spark.createDataFrame(
        [(1, None), (2, "some real text here")],
        "doc_id: long, text: string",
    )
    assert list(chunk_spans(None)) == []
    hof = chunk_windows(df).select("doc_id").collect()
    assert {r["doc_id"] for r in hof} == {2}
    spark.udtf.register("overlap_chunks_nulltest", OverlapChunker)
    df.createOrReplaceTempView("_chunk_null_docs")
    ud = spark.sql(
        """SELECT d.doc_id FROM _chunk_null_docs d,
           LATERAL overlap_chunks_nulltest(d.text) c"""
    ).collect()
    assert {r["doc_id"] for r in ud} == {2}


def test_chunk_plan_has_no_shuffle(spark):
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    plan = chunk_windows(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local explode, zero shuffle
    # 'Generate' + 'explode' asserted separately — the exact display
    # string between them is not contractual across Spark versions
    # (r8 review)
    assert "Generate" in plan
    assert "explode" in plan


# ----------------------------------------------------------- properties

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(0, 500),
        w=st.integers(1, 64),
        data=st.data(),
    )
    def test_chunk_geometry_properties(n, w, data):
        """For ANY valid window/stride (0 < s <= w — s > w is rejected
        with ValueError, see below): full coverage (last chunk reaches
        the final token), correct count formula, starts at i*s, and no
        empty chunks."""
        s = data.draw(st.integers(1, w))
        toks = [f"t{i}" for i in range(n)]
        text = " ".join(toks) if toks else ""
        spans = list(chunk_spans(text, w=w, s=s))
        m = max(n, 1)  # empty text still tokenizes to [''] in SQL land
        want_count = 1 if m <= w else (m - w + s - 1) // s + 1
        assert len(spans) == want_count
        for i, (ci, ntk, _h) in enumerate(spans):
            assert ci == i
            assert ntk == min(w, m - i * s)
            assert ntk >= 1
        assert spans[-1][0] * s + spans[-1][1] == m  # coverage

    def test_stride_past_window_rejected():
        """s > w would emit empty tail windows (hypothesis-found r8);
        both paths refuse it loudly instead."""
        with pytest.raises(ValueError):
            list(chunk_spans("a b c", w=2, s=3))
        from data_warehousing_assignment_spark.operators.text import n_chunks

        with pytest.raises(ValueError):
            n_chunks(F.lit(10), w=2, s=3)
