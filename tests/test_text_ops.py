"""BPE-ish token counting vs Python re, and rolling-hash fingerprint
properties (pure-Python parity + shared-window collision)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators import text as tx
from tests.conftest import SF_SMALL

PY_RE = re.compile(r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+")


def py_rolling(text: str, k: int = tx.ROLL_K) -> int:
    t = text.lower()
    n = len(t)
    hashes = []
    for i in range(max(n - k + 1, 1)):
        h = 0
        for ch in t[i : i + k]:
            h = (h * tx.ROLL_BASE + ord(ch)) % tx.ROLL_MOD
        hashes.append(h)
    return min(hashes)


TEXTS = [
    (0, "Hello, world! It's 2024."),
    (1, "short"),
    (2, "the quick brown fox jumps over the lazy dog once more"),
    (3, "the quick brown fox jumps over the lazy dog once more, extended"),
]


def test_bpe_token_count_matches_python_re(spark):
    df = spark.createDataFrame(TEXTS, "doc_id int, text string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", tx.bpe_token_count("text").alias("n")
        ).collect()
    }
    for doc_id, text in TEXTS:
        assert out[doc_id] == len(PY_RE.findall(text.lower())), text


def test_rolling_fingerprint_matches_python(spark):
    df = spark.createDataFrame(TEXTS, "doc_id int, text string")
    out = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", tx.rolling_hash_fingerprint("text").alias("f")
        ).collect()
    }
    for doc_id, text in TEXTS:
        assert out[doc_id] == py_rolling(text), text


def test_rolling_fingerprint_collides_on_shared_prefix(spark):
    # doc 3 = doc 2 + a suffix: its window set is a superset, so its min
    # can only be <= — and for these texts the shared windows dominate
    df = spark.createDataFrame(TEXTS, "doc_id int, text string")
    out = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", tx.rolling_hash_fingerprint("text").alias("f")
        ).collect()
    }
    assert out[3] <= out[2]
    assert py_rolling(TEXTS[2][1]) == out[2]


def test_contamination_hits_exact_counts(spark):
    from data_warehousing_assignment_spark.operators.text import (
        contamination_hits,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the 3-grams "alpha beta gamma" AND "beta gamma delta"
            (1, "zz alpha beta gamma delta yy"),
            # shares exactly one 3-gram
            (2, "alpha beta gamma zz"),
            # no overlap
            (3, "one two three four"),
            # duplicate occurrences of a shared gram count once
            (4, "alpha beta gamma xx alpha beta gamma"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.n_hits
        for r in contamination_hits(corpus, bench, n=3).collect()
    }
    assert got == {1: 2, 2: 1, 4: 1}


def test_contamination_short_doc_full_text_fallback(spark):
    from data_warehousing_assignment_spark.operators.text import (
        contamination_hits,
    )

    # a <n-token benchmark doc contributes its full text as one gram;
    # an identical short corpus doc must therefore hit it
    bench = spark.createDataFrame(
        [(9, "tiny doc")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other text")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.n_hits
        for r in contamination_hits(corpus, bench, n=8).collect()
    }
    assert got == {1: 1}


def py_bpe_token_count(text: str, merges=tx.BPE_MERGES_V1, eow="▁") -> tuple:
    """Pure-Python replay of the BPE ENCODE contract: per qualifying
    word, greedy left-to-right application of each merge rule in rank
    order (one full pass per rule — the same semantics as one
    non-overlapping replace())."""
    words = [
        w for w in re.split(r"\s+", text.strip().lower())
        if re.fullmatch(r"[a-z0-9]+", w)
    ]
    n_in = 0
    n_out = 0
    for w in words:
        syms = list(w) + [eow]
        n_in += len(syms)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n_out += len(syms)
    return len(words), n_in, n_out


def test_bpe_apply_counts_matches_python_replay(spark):
    texts = TEXTS + [
        (4, "lower slower flower tower "),      # chained er/er▁ merges
        (5, "aaa aa a"),                        # self-overlapping pairs
        (6, "stat state station in inn"),       # st/at/in interactions
        (7, "  (brackets) stay OUT 42 ok  "),   # non-alnum words drop
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_words, r.n_syms_in, r.n_bpe_tokens)
        for r in tx.bpe_apply_counts(df, "doc_id", "text").collect()
    }
    for doc_id, text in texts:
        expect = py_bpe_token_count(text)
        if expect[0] == 0:
            assert doc_id not in got, text
        else:
            assert got[doc_id] == expect, text


# ---------------------------------------------------------------- winnowing


def py_winnow(text: str, k: int = tx.ROLL_K, w: int = tx.WINNOW_W) -> list:
    """Reference winnowing (Schleimer/Wilkerson/Aiken): window-min over
    the k-gram rolling hashes, distinct, first-occurrence order."""
    t = text.lower()
    n = len(t)
    hashes = []
    for i in range(max(n - k + 1, 1)):
        h = 0
        for ch in t[i : i + k]:
            h = (h * tx.ROLL_BASE + ord(ch)) % tx.ROLL_MOD
        hashes.append(h)
    mins = [
        min(hashes[j : j + w]) for j in range(max(len(hashes) - w + 1, 1))
    ]
    seen: list = []
    for m in mins:
        if m not in seen:
            seen.append(m)
    return seen


def _spark_winnow(spark, texts):
    df = spark.createDataFrame(texts, "doc_id int, text string")
    staged = df.select("doc_id", tx.winnow_hashes("text").alias("hs"))
    return {
        r.doc_id: r.fps
        for r in staged.select(
            "doc_id", tx.winnow_select("hs").alias("fps")
        ).collect()
    }


def test_winnow_matches_python_replay(spark):
    out = _spark_winnow(spark, TEXTS)
    for doc_id, text in TEXTS:
        assert out[doc_id] == py_winnow(text), text


def test_winnow_np_twin_matches_hof(spark):
    """tx.winnow_fps_np (the Arrow-batched fast path the registry ops
    ride since r10) must select exactly the HOF chain's fingerprints —
    element equality up to order (np returns them sorted) — on the
    python-replay fixtures AND the real sf0.001 corpus."""
    # non-ASCII rows (r10 advice): Python str.lower() vs JVM lower()
    # can in principle diverge on one-to-many case maps — these pin the
    # classic traps (U+0130 İ, ß, Greek final sigma, combining marks)
    # so any divergence fails HERE, not as a production oracle mismatch
    unicode_rows = [
        (100, "İSTANBUL city on the Bosphorus strait"),
        (101, "Straße und Gasse lang genug für Fenster"),
        (102, "ΣΟΦΟΣ ΛΟΓΟΣ wisdom words ending in sigma"),
        (103, "Ñandú corre rápido por el camino largo"),
    ]
    all_texts = TEXTS + unicode_rows
    df = spark.createDataFrame(all_texts, "doc_id int, text string")
    got = {
        r.doc_id: sorted(r.fps)
        for r in df.select(
            "doc_id", tx.winnow_fps_np("text").alias("fps")
        ).collect()
    }
    for doc_id, text in TEXTS:
        assert got[doc_id] == sorted(py_winnow(text)), text
    hof_u = {
        r.doc_id: sorted(r.fps)
        for r in df.filter(F.col("doc_id") >= 100)
        .select(
            "doc_id",
            F.array_sort(
                tx.winnow_select(tx.winnow_hashes("text"))
            ).alias("fps"),
        )
        .collect()
    }
    for doc_id, text in unicode_rows:
        assert got[doc_id] == hof_u[doc_id], (text, "np vs HOF lower() drift")

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    hof = (
        docs.select("doc_id", tx.winnow_hashes("text").alias("hs"))
        .select(
            "doc_id", F.array_sort(tx.winnow_select("hs")).alias("fps")
        )
    )
    np_ = docs.select("doc_id", tx.winnow_fps_np("text").alias("fps"))
    mism = (
        hof.alias("h")
        .join(np_.alias("n"), "doc_id")
        # null-safe inequality: a plain != is NULL (not true) when one
        # side is NULL, which would hide a NULL-handling divergence
        .where(~F.col("h.fps").eqNullSafe(F.col("n.fps")))
        .count()
    )
    assert mism == 0


def test_winnow_np_null_text_yields_null_not_zero(spark):
    """NULL text must produce NULL fingerprints (the HOF/oracle
    behavior), never the fabricated [0] that would join every NULL-text
    doc as a near-dup candidate."""
    df = spark.createDataFrame(
        [(1, None), (2, "some real text here")], "doc_id int, text string"
    )
    rows = {
        r.doc_id: r.fps
        for r in df.select(
            "doc_id", tx.winnow_fps_np("text").alias("fps")
        ).collect()
    }
    assert rows[1] is None
    assert rows[2]  # non-null text still fingerprints


def test_winnow_shared_substring_guarantee(spark):
    # SIGMOD'03 theorem: a shared substring of length >= k + w - 1
    # contributes at least one shared SELECTED fingerprint. Embed the
    # same (k+w-1)-char core in two otherwise-unrelated documents.
    core = "zq" * ((tx.ROLL_K + tx.WINNOW_W - 1 + 1) // 2)  # >= k+w-1
    texts = [
        (0, "completely unrelated preamble text " + core + " tail one"),
        (1, core + " a different continuation entirely, nothing shared"),
    ]
    out = _spark_winnow(spark, texts)
    assert set(out[0]) & set(out[1]), "guarantee violated: no shared fp"


def test_winnow_density_near_two_over_w_plus_one(spark):
    # Expected selection density on random-ish text is 2/(w+1); allow a
    # wide band — the point is "a small fraction, not every k-gram".
    text = TEXTS[2][1] * 40  # ~2k chars
    fps = _spark_winnow(spark, [(0, text)])[0]
    n_positions = len(text) - tx.ROLL_K + 1
    density = len(fps) / n_positions
    assert density < 0.75  # far below "all positions"
    assert len(fps) >= 1


def py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


def test_winnow_neardup_pairs_are_verified_near_dups(spark):
    from data_warehousing_assignment_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    out = all_queries()["op-ext-winnow-neardup"](spark, SF_SMALL).collect()
    assert out, "the near-dup-heavy corpus must yield verified pairs"
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_SMALL}/documents.parquet"
        ).collect()
    }
    for r in out:
        assert r.doc_a < r.doc_b
        assert r.n_shared >= 3
        # the registered contract: within 30% relative edit distance
        a, b = docs[r.doc_a], docs[r.doc_b]
        assert r.edit_dist * 10 <= 3 * max(len(a), len(b))
    # spot-check the edit distances against a literal DP replay
    for r in sorted(out, key=lambda r: (r.doc_a, r.doc_b))[:5]:
        assert r.edit_dist == py_levenshtein(docs[r.doc_a], docs[r.doc_b])
