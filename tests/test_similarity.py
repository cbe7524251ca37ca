"""Similarity-search tests: deterministic cosine vs numpy, brute-force
top-k correctness, and LSH recall against the brute-force baseline on the
real sf0.001 embeddings table."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators import similarity as sim
from tests.conftest import SF_SMALL

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
]


def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<float>")


def np_cos(a, b):
    # the Spark column is array<float>: round-trip through float32 first,
    # exactly like the stored values the engine quantizes
    qa = np.floor(np.asarray(a, dtype=np.float32).astype(np.float64) * 1e6)
    qb = np.floor(np.asarray(b, dtype=np.float32).astype(np.float64) * 1e6)
    return float(qa @ qb / (math.sqrt(qa @ qa) * math.sqrt(qb @ qb)))


def test_cosine_matches_numpy_quantized(spark):
    df = vec_df(spark).alias("a").crossJoin(vec_df(spark).alias("b"))
    out = df.select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        sim.cosine_similarity_col(F.col("a.embedding"), F.col("b.embedding")).alias(
            "c"
        ),
    ).collect()
    by_pair = {(r.ia, r.ib): r.c for r in out}
    for (ia, va), (ib, vb) in [(VECS[i], VECS[j]) for i in range(4) for j in range(4)]:
        assert by_pair[(ia, ib)] == pytest.approx(np_cos(va, vb), abs=1e-12)


def test_brute_force_topk_ranks_correctly(spark):
    df = vec_df(spark)
    out = sim.brute_force_cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [1, 2, 3]  # by descending cosine
    assert rows[0].score > rows[1].score > rows[2].score


def test_lsh_recall_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.brute_force_cosine_topk(emb, queries, k=5)
    approx = sim.lsh_cosine_topk(emb, queries, k=5, n_planes=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4 hyperplanes → 16 buckets; same-bucket required ⇒ imperfect recall,
    # but far better than chance. Deterministic hashing ⇒ stable number.
    assert recall >= 0.3, f"recall {recall:.2f}"


def test_embedding_near_dup_pairs_symmetric_free(spark):
    df = vec_df(spark)
    out = sim.embedding_near_dup_pairs(df, threshold=0.9, n_planes=2).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert r.cosine >= 0.9


def test_lsh_probe_all_equals_brute_force(spark):
    """probe_all=True covers every sign bucket ⇒ identical output to the
    brute-force baseline (the equivalence op-ext-ann-lsh-fullprobe's
    shared oracle relies on)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.brute_force_cosine_topk(emb, queries, k=5)
    full = sim.lsh_cosine_topk(emb, queries, k=5, probe_all=True)
    canon = lambda df: sorted(
        (r.query_id, r.neighbor_id, r.rank, r.score) for r in df.collect()
    )
    assert canon(full) == canon(exact)


def test_exact_near_dup_superset_of_bucketed(spark):
    """The all-pairs anchor finds every pair the bucketed LSH variant
    finds (LSH may only MISS pairs, never invent them), and every pair
    clears the threshold."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = {
        (r.doc_a, r.doc_b)
        for r in sim.exact_near_dup_pairs(emb, threshold=0.5).collect()
    }
    bucketed = {
        (r.doc_a, r.doc_b)
        for r in sim.embedding_near_dup_pairs(emb, threshold=0.5).collect()
    }
    assert bucketed <= exact
    for a, b in exact:
        assert a < b


def test_label_centroids_match_numpy(spark):
    """Distributed per-label centroid ≡ numpy mean of the same vectors
    (to float-accumulation tolerance), dims in order."""
    import numpy as np

    from data_warehousing_assignment_spark.operators.similarity import (
        label_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = {
        r.label: (r.n_vecs, list(r.centroid))
        for r in label_centroids(emb, "label", "embedding").collect()
    }
    by_label = {}
    for r in emb.select("label", "embedding").collect():
        by_label.setdefault(r.label, []).append(r.embedding)
    assert set(got) == set(by_label)
    for lbl, vecs in by_label.items():
        n, cent = got[lbl]
        assert n == len(vecs)
        ref = np.asarray(vecs, dtype=np.float64).mean(axis=0)
        assert np.allclose(np.asarray(cent), ref, rtol=1e-9, atol=1e-12)
