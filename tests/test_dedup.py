"""Dedup operator tests: exact hash dedup, MinHash signatures vs a pure-
Python reference, LSH candidate generation recall on constructed
near-duplicates, and n-gram Jaccard values."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different text about spark engines and shuffles"),
    (3, "The Quick  Brown fox jumps over the lazy dog"),  # exact dup of 0 mod ws/case
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def py_minhash(text: str, k: int = 12, n: int = 3) -> list[str]:
    toks = re.split(r"\s+", text.strip().lower())
    sh = (
        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n
        else [" ".join(toks)]
    )
    return [
        min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
        for i in range(k)
    ]


def test_duplicate_rows_multiplicity(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2)], "x string, y int"
    )
    out = {(r.x, r.y): r.n_rows for r in dd.duplicate_rows(df).collect()}
    assert out == {("a", 1): 3}


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    out = dd.exact_dedup(docs_df(spark), "text", "doc_id").collect()
    groups = {r.keep_id: r.group_size for r in out}
    # doc 3 collapses into doc 0's group after normalization
    assert groups[0] == 2
    assert groups[1] == 1 and groups[2] == 1
    assert 3 not in groups


def test_minhash_signature_matches_python(spark):
    out = (
        docs_df(spark)
        .select("doc_id", dd.minhash_signature("text", 12).alias("sig"))
        .collect()
    )
    for r in out:
        assert list(r.sig) == py_minhash(DOCS[r.doc_id][1]), r.doc_id


def test_lsh_candidates_catch_near_dups_not_distinct_docs(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_candidates(
            docs_df(spark), "doc_id", "text", k=12, bands=4
        ).collect()
    }
    assert (0, 3) in pairs  # exact dup (mod case/ws) always collides
    assert (0, 1) in pairs  # near-dup shares most shingles
    assert (0, 2) not in pairs and (1, 2) not in pairs  # unrelated docs


def test_ngram_jaccard_values(spark):
    df = docs_df(spark)
    cands = spark.createDataFrame([(0, 3), (0, 2)], "doc_a int, doc_b int")
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(df, cands, "doc_id", "text").collect()
    }
    assert out[(0, 3)] == 1.0  # identical after lowercase/ws-normalization
    assert out[(0, 2)] == 0.0  # no shared shingles


def test_simhash_near_dups_have_small_hamming_distance(spark):
    fps = {
        r.doc_id: r.simhash
        for r in dd.simhash(docs_df(spark), "doc_id", "text").collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[0], fps[3]) == 0  # identical token multiset
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])

def test_near_dup_clusters_equals_raw_graph_cc(spark):
    """The exact-collapse fast path must be invisible in the result:
    clustering through representatives equals connected components over
    the raw (per-document) LSH+Jaccard pair graph."""
    from data_warehousing_assignment_spark.operators import graph as gr

    # extra exact copies so the collapse path actually collapses
    rows = DOCS + [
        (4, "the quick brown fox jumps over the lazy dog"),  # copy of 0
        (5, "completely different text about spark engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    fast = {
        (r.doc_id, r.cluster_id)
        for r in dd.near_dup_clusters(df, "doc_id", "text", 12, 4, 0.5).collect()
    }

    cands = dd.minhash_lsh_candidates(df, "doc_id", "text", 12, 4)
    edges = dd.ngram_jaccard_pairs(
        df, cands, "doc_id", "text", threshold=0.5
    ).select("doc_a", "doc_b")
    raw = {
        (r.doc_id, r.component)
        for r in gr.connected_components(
            df.select("doc_id"), edges, id_col="doc_id",
            src_col="doc_a", dst_col="doc_b",
        ).collect()
    }
    assert fast == raw
    # sanity on shape: 0/1/3/4 one near-dup cluster labeled 0; 2/5 labeled 2
    assert fast == {(0, 0), (1, 0), (3, 0), (4, 0), (2, 2), (5, 2)}


def test_simhash_neardup_pairs_equals_all_pairs(spark):
    """Banded bucket join must reproduce the all-pairs Hamming result
    exactly (pigeonhole recall for max_hamming < bands)."""
    rows = [(i, t) for i, (_, t) in enumerate(DOCS)] + [
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "spark engines and shuffles make completely different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_neardup_pairs(
            df, "doc_id", "text", bands=4, max_hamming=3
        ).collect()
    }

    fps = {r.doc_id: r.simhash for r in dd.simhash(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    naive = {
        (a, b, ham(fps[a], fps[b]))
        for a in fps for b in fps
        if a < b and ham(fps[a], fps[b]) <= 3
    }
    assert banded == naive
    assert (0, 3, 0) in banded  # exact dup mod case/ws → distance 0


def test_simhash_neardup_rejects_lossy_banding(spark):
    df = docs_df(spark)
    import pytest

    with pytest.raises(ValueError):
        dd.simhash_neardup_pairs(df, "doc_id", "text", bands=4, max_hamming=4)
