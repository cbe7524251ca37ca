"""r12 measured experiment (r11 verdict #2): lift the IVF-PQ recall
ceiling. recall@5 0.48 at the shipped operating point (n_probe=4,
n_clusters=16, K=64, rerank=25) EQUALS the IVF candidate ceiling on the
same cells — PQ loses nothing, the cells do. Candidates to lift it:

  (a) residual PQ (Jegou 2011 § IV.A: quantize x - centroid(cell(x)))
  (b) n_probe 4 -> 8 on the same index

This script measures recall@5 vs brute force AND wall seconds for:
ivf-exact @4/@8 (the ceilings), ivf-pq non-residual @4/@8, and
ivf-pq residual @4/@8, on the driver testdata embeddings.

Usage: python tools/pq_experiment.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_warehousing_assignment_spark.session import get_spark  # noqa: E402
from data_warehousing_assignment_spark.operators import ivf, pq  # noqa: E402
from data_warehousing_assignment_spark.operators.similarity import (  # noqa: E402
    brute_force_cosine_topk,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("pq-experiment")
    corpus = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") % 100 == 0)
    nq = queries.count()
    print(f"corpus={corpus.count()} queries={nq}")

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(corpus, queries, k=5).collect()
    }

    def run(label, fn):
        t0 = time.monotonic()
        got = {(r.query_id, r.neighbor_id) for r in fn().collect()}
        secs = time.monotonic() - t0
        rec = len(got & exact) / len(exact)
        print(f"{label:28s} recall@5={rec:.3f}  wall={secs:6.1f}s "
              f"rps={rec / secs:.4f}")
        return rec, secs

    for np_ in (4, 8):
        run(f"ivf-exact  n_probe={np_}", lambda np_=np_: ivf.ivf_cosine_topk(
            corpus, queries, k=5, n_clusters=16, n_probe=np_))
    for np_ in (4, 8):
        run(f"ivf-pq      n_probe={np_}", lambda np_=np_: pq.ivf_pq_cosine_topk(
            corpus, queries, k=5, n_clusters=16, n_probe=np_, rerank=25))
    for np_ in (4, 8):
        run(
            f"ivf-pq-res  n_probe={np_}",
            lambda np_=np_: pq.ivf_pq_cosine_topk(
                corpus, queries, k=5, n_clusters=16, n_probe=np_,
                rerank=25, residual=True),
        )


if __name__ == "__main__":
    main()
