"""Round-14 retrieval measurements (reproducible; numbers quoted in
BASELINE.md "## Round 14"):

1. Block-max/MaxScore prune reduction by TERM SPACE — the synthetic
   corpus's unigram vocabulary is deliberately tiny and dense (every doc
   matches ~every query through some term), the worst case for
   candidate-level pruning; the ~quadratically sparser bigram space
   shows the regime the prune is built for.
2. Filtered-search recall vs predicate selectivity — filter-aware
   candidate generation (label band as an equi-key of the probed-cell
   join) vs post-filtering the unfiltered top-20, both against the
   brute-force filtered ground truth on the fixed 100-query sample.

Usage: python tools/retrieval_experiments.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def blockmax_reduction(spark, sf_dir: str, bigram: bool) -> dict:
    from data_warehousing_assignment_spark.registry_extensions import (
        _blockmax_frames,
    )

    fr = _blockmax_frames(spark, sf_dir, bigram_terms=bigram)
    qt, postings = fr["qt"], fr["postings"]
    unpruned = (
        qt.join(postings, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .count()
    )
    essential = (
        fr["ess"]
        .join(postings, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .count()
    )
    n_cand = fr["cand"].count()
    scored = (
        fr["cand"]
        .join(qt, "query_id")
        .join(
            postings.withColumnRenamed("doc_id", "neighbor_id"),
            ["tok", "neighbor_id"],
        )
        .count()
    )
    return {
        "terms": "bigram" if bigram else "unigram",
        "unpruned_rows": unpruned,
        "essential_rows": essential,
        "n_candidates": n_cand,
        "scored_rows": scored,
        "candgen_reduction_pct": round(100 * (1 - essential / unpruned), 1),
        "total_vs_naive_pct": round(
            100 * (essential + scored) / unpruned, 1
        ),
    }


def filtered_recall(spark, sf_dir: str, band: int) -> dict:
    from data_warehousing_assignment_spark.operators import similarity as sim
    from data_warehousing_assignment_spark.registry import t
    from data_warehousing_assignment_spark.registry_extensions import (
        _filtered_aware_top,
        _FILT_TOPK,
        _postfilter_top,
        audit_sample,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = audit_sample(emb)
    aware5 = _filtered_aware_top(spark, sf_dir, band=band).select(
        "query_id", F.col("neighbor_id").alias("_na")
    )
    post5 = _postfilter_top(spark, sf_dir, band=band).select(
        "query_id", F.col("neighbor_id").alias("_np")
    )
    qs = queries.select(
        F.col("vec_id").alias("query_id"),
        sim.quantize("embedding").alias("qvec"),
        F.expr(f"label div {band}").alias("_lb"),
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        sim.quantize("embedding").alias("cv"),
        F.expr(f"label div {band}").alias("_lb"),
    ).join(F.broadcast(qs), "_lb")
    dot = sim.int_dot(F.col("qvec"), F.col("cv"))
    nq = F.sqrt(sim.int_dot(F.col("qvec"), F.col("qvec")).cast("double"))
    nc = F.sqrt(sim.int_dot(F.col("cv"), F.col("cv")).cast("double"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    truth5 = (
        cand.filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot.cast("double") / (nq * nc)).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _FILT_TOPK)
        .select("query_id", "neighbor_id")
    )
    agg = (
        truth5.join(
            aware5,
            (truth5.query_id == aware5.query_id)
            & (truth5.neighbor_id == aware5._na),
            "left",
        )
        .drop(aware5.query_id)
        .join(
            post5,
            (truth5.query_id == post5.query_id)
            & (truth5.neighbor_id == post5._np),
            "left",
        )
        .drop(post5.query_id)
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("_na").alias("hits_aware"),
            F.count("_np").alias("hits_post"),
        )
        .collect()[0]
    )
    return {
        "band": band,
        "selectivity_pct": band * 10,
        "n_truth": agg["n_truth"],
        "recall_aware_pct": round(100 * agg["hits_aware"] / agg["n_truth"], 1),
        "recall_post_pct": round(100 * agg["hits_post"] / agg["n_truth"], 1),
    }


def main() -> int:
    from data_warehousing_assignment_spark.caching import release_unscoped
    from data_warehousing_assignment_spark.session import get_spark

    spark = get_spark("retrieval-experiments")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    out: dict = {}
    for sf_dir in sf_dirs:
        rows = []
        for bigram in (False, True):
            rows.append(blockmax_reduction(spark, sf_dir, bigram))
            release_unscoped()
        sweeps = []
        for band in (1, 2, 5, 10):
            sweeps.append(filtered_recall(spark, sf_dir, band))
            release_unscoped()
        out[sf_dir] = {"blockmax": rows, "filtered_recall": sweeps}
        print(json.dumps({sf_dir: out[sf_dir]}, indent=2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
