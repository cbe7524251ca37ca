"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full materialization of
every column — ``count()`` alone would let Catalyst prune the plan), so
the timings reflect scan + shuffle + compute, not just row counting.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per workload family, weighted toward the shapes that
# dominate at 100 TB (star joins, wide aggs, SCD2 merge, incremental fact
# dedup, minhash-LSH dedup, brute-force ANN, sessionization).
HEADLINE = [
    "op-join-inner-star",       # flagship 4-table star join + monthly agg
    "op-pipe-kpi-gross-monthly",  # 3-way join, group by (month, dept, type)
    "op-pipe-scd2",             # hash-diff SCD2 merge
    "op-pipe-fact-incr",        # dim resolution + multi-col anti-join dedup
    "op-pipe-impute",           # group-mean imputation (window agg)
    "op-agg-count-distinct",    # grouped exact count-distinct
    "op-join-update",           # staging enrichment join
    "op-ext-dedup-exact",       # content-hash dedup over documents
    "op-ext-minhash-lsh",       # banded LSH candidate pairs
    "op-ext-simhash",           # 48-bit simhash fingerprints
    "op-ext-ann-bruteforce",    # cosine top-k, query set vs full corpus
    "op-ext-stream-session",    # session windows over events
    "op-ext-asof-join",         # point-in-time join (window formulation)
    "op-ext-salted-join",       # skew-salted equi-join
]


def force(df) -> int:
    """Materialize every column of every row. The noop sink runs the whole
    plan with zero write cost; fall back to a count over an uncacheable
    projection if the noop source is unavailable."""
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from data_warehousing_assignment_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    sf = None
    try:
        # ".../sf0.1" -> 0.1 (best effort; sf stays None on nonstandard dirs)
        tail = os.path.basename(SF_DIR.rstrip("/"))
        if tail.startswith("sf"):
            sf = float(tail[2:])
    except ValueError:
        sf = None

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, SF_DIR)
            force(df)  # warm-up: JIT, parquet footer cache, broadcast build
            t0 = time.perf_counter()
            force(df)
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken query must not zero the bench
            print(f"# bench skip {name}: {exc!r}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall seconds (noop-sink, warm)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
