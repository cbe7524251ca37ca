"""Python UDTF surface (Spark 4): a lateral table function emitting the
same overlapping token-window chunks as the built-in HOF formulation
(operators/text.py:chunk_windows).

Why both exist: chunk_windows is the 100 TB path (whole-stage codegen,
no Python), this UDTF is the §2.10 API-surface demo — Spark 4's
user-defined TABLE function invoked via ``LATERAL`` in SQL, the
interface a user reaches for when per-row fan-out logic genuinely can't
be expressed with transform/explode. The two are pinned row-identical
(tests/test_chunking.py) so the demo can never drift from the engine
semantics.

Tokenization mirrors operators/text.py:tokens exactly: SQL TRIM strips
spaces only (not all whitespace), lower() then split on ``\\s+``.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf

from data_warehousing_assignment_spark.operators.text import CHUNK_S, CHUNK_W


def chunk_spans(text: str, w: int = CHUNK_W, s: int = CHUNK_S):
    """Pure-python twin of the chunk geometry: yields
    (chunk_idx, n_chunk_toks, chunk_md5) per window. NULL text yields
    nothing — the HOF path's sequence(NULL) explode and the oracle's
    range-over-NULL both drop the row, so the UDTF must too.

    Requires ``0 < s <= w``: the ceil((n-w)/s)+1 count (stop once the
    end is covered) only guarantees gap-free, non-empty windows for
    stride ≤ window — hypothesis found the s>w spurious-empty-tail
    case (tests/test_chunking.py)."""
    if not 0 < s <= w:
        raise ValueError(f"stride must satisfy 0 < s <= w, got s={s} w={w}")
    if text is None:
        return
    # SQL-trim (spaces only) + lower + \s+ split — NOT str.split(), whose
    # empty-string behavior ([] vs ['']) differs from both engines.
    toks = re.split(r"\s+", text.strip(" ").lower())
    n = len(toks)
    count = 1 if n <= w else (n - w + s - 1) // s + 1
    for i in range(count):
        seg = toks[i * s : i * s + w]
        yield (
            i,
            len(seg),
            hashlib.md5(" ".join(seg).encode("utf-8")).hexdigest(),
        )


# Serialization: measured at the 10x probe (r8), pickle rows beat
# useArrow=True 0.48s vs 1.25s for THIS shape — one short string in,
# three small scalars out per yield; Arrow's per-eval record-batch
# setup only pays for wide/numeric rows. Deliberately default (pickle).
@udtf(returnType="chunk_idx: bigint, n_chunk_toks: bigint, chunk_md5: string")
class OverlapChunker:
    """``SELECT d.*, c.* FROM docs d, LATERAL overlap_chunks(d.text) c``."""

    def eval(self, text: str):  # noqa: D102 — contract is the class doc
        yield from chunk_spans(text)


def register(spark) -> None:
    spark.udtf.register("overlap_chunks", OverlapChunker)
