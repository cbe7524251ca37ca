"""IVF (inverted-file) approximate nearest neighbor — the second scale
path next to hyperplane LSH (extension surface, SURVEY.md §7.5).

Classic IVF: k-means the corpus into ``n_clusters`` coarse cells once
(an offline, amortized build), then answer each query by scoring only
the ``n_probe`` nearest cells — candidate work is
O(n_probe · corpus / n_clusters) per query instead of O(corpus).

Everything is deterministic (no RNG): initial centroids are the
``n_clusters`` lowest-id vectors, and Lloyd iterations are pure
DataFrame computation — assignment is an argmin over a broadcast
centroid table (min_by), the update step is an element-wise mean via
posexplode + two hash aggregations. Iteration happens driver-side over
a lazy plan per round (standard Spark iterative-algorithm shape; at
scale you checkpoint between rounds to cut lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.caching import pin
from data_warehousing_assignment_spark.operators.similarity import (
    int_dot,
    quantize,
)


def _l2sq(a, b):
    """Exact integer squared-L2 between two quantized vectors."""
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(
        F.transform(diff, lambda d: d * d),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign(corpus: DataFrame, centroids: DataFrame, n_probe: int = 1) -> DataFrame:
    """(id, vec, cluster) for each corpus row — or the n_probe nearest
    clusters per row when n_probe > 1 (used on the query side).

    Ordering key: argmin over centroids of ‖a−b‖² = ‖a‖² − 2a·b + ‖b‖²
    only needs the per-row-RELATIVE part ‖b‖² − 2a·b (‖a‖² is constant
    within a row's candidate set and both forms are exact int64, so the
    order AND every tie are identical). ‖b‖² is precomputed once per
    centroid; per (row × centroid) the cost is one dot product instead
    of the 3-pass zip/square/sum of a materialized difference vector.

    n_probe == 1 (the corpus-assignment path, every build/extend pass):
    the argmin is a map-side-combinable MIN(struct(_d, cluster)) — the
    pre-aggregation collapses the k candidate rows per vector to 1
    BEFORE the exchange, so the shuffle carries n rows instead of the
    window formulation's n·k rows (each dragging the full qvec array;
    guide §2.3 "aggregate before you shuffle"). struct min is
    lexicographic ⇒ exactly row_number().orderBy(_d, cluster) rank 1.

    n_probe > 1 (query-side probing, Q rows): window ranking unchanged.
    """
    cent = F.broadcast(
        centroids.withColumn(
            "_nb2", int_dot(F.col("centroid"), F.col("centroid"))
        )
    )
    scored = corpus.crossJoin(cent).select(
        corpus["*"],
        F.col("cluster"),
        (F.col("_nb2") - 2 * int_dot(F.col("qvec"), F.col("centroid")))
        .alias("_d"),
    )
    if n_probe == 1:
        # Group on the primitive id columns only — an array in the
        # grouping key would make every sort/merge comparison walk the
        # 64-element vector. qvec rides along via first(): all k
        # candidate rows of a group carry the IDENTICAL qvec, so
        # first() is value-deterministic regardless of row order.
        keys = [c for c in corpus.columns if c != "qvec"]
        out_cols = [
            F.col("qvec") if c == "qvec" else F.col(c)
            for c in corpus.columns
        ]
        return (
            scored.groupBy(*keys)
            .agg(
                F.min(F.struct("_d", "cluster")).alias("_best"),
                F.first("qvec").alias("qvec"),
            )
            .select(*out_cols, F.col("_best.cluster").alias("cluster"))
        )
    w = Window.partitionBy(*[c for c in corpus.columns if c != "qvec"]).orderBy(
        "_d", "cluster"
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_probe)
        .drop("_d", "_rk")
    )


def auto_n_clusters(
    n_corpus: int,
    n_queries: int,
    n_probe: int = 4,
    n_build_passes: int = 3,
    floor: int = 16,
) -> int:
    """Cost-balanced cell count for one build + one query batch.

    Work model (d cancels): the build runs ``n_build_passes`` assignment
    passes of n·k centroid distances plus Q·k on the query side; probing
    scores Q·n_probe·(n/k) candidates. Balancing the k and 1/k terms
    gives k* = sqrt(Q·n_probe·n / (R·n + Q)) ≈ sqrt(Q·n_probe/R) for
    Q ≪ n. Measured at the synthesized sf10 (1 M vectors, 10 k queries,
    BASELINE.md r9): fixed k=16 → 80.7 s, this rule's regime (k≈115,
    probed 64/256 around it: 35.2 s / 56.4 s) — the pinned k=16 in the
    registered query is the oracle-replay anchor, this is the scale
    sizing. Clamped to [floor, n/8] so tiny corpora keep meaningful
    cells."""
    import math

    # Degenerate inputs (empty corpus or empty query batch): den would be
    # 0.0 and num/den a raw ZeroDivisionError (r14 self-review). Return
    # the floor — an empty corpus builds an empty index and every
    # downstream frame degrades to zero rows, matching the SQL twin's
    # empty-seed degradation.
    if n_corpus <= 0 or n_queries <= 0:
        return floor
    r = max(1, n_build_passes)
    # Round EXACTLY like the SQL twin (registry_extensions.IVF_KK_EXPR):
    # numerator and denominator are each rounded to double BEFORE the
    # divide. A bare int/int here would divide exact arbitrary-precision
    # ints with ONE rounding, which can flip FLOOR(SQRT(...)) by 1 once
    # q·n_probe·n exceeds 2^53 (r10 advice). Domain limit shared with
    # the SQL: exact while q·n_probe·n < 2^63 (BIGINT product bound);
    # beyond that the SQL side would overflow first.
    num = float(n_queries * n_probe * n_corpus)
    den = float(r * n_corpus + n_queries)
    k = int(math.sqrt(max(1.0, num / den)))
    return max(floor, min(k, max(floor, n_corpus // 8)))


def assign_to_index(
    frame: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) for every row of ``frame`` by argmin against the
    given centroids — THE assignment step, one definition shared by
    :func:`build_ivf_index`'s final pass and
    :func:`extend_ivf_index`'s delta pass so the two can never diverge
    in quantization or tie-break (the incremental index's
    oracle-equivalence rests on exactly that identity)."""
    vecs = frame.select(
        F.col(id_col).alias("_id"), quantize(vec_col).alias("qvec")
    )
    return _assign(vecs, centroids).select(
        F.col("_id").alias(id_col), "cluster"
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iters: int = 2,
    checkpoint_every: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids(cluster, centroid), assignments(id, cluster)).

    Init: the n_clusters lowest-id vectors (deterministic). Each Lloyd
    round: argmin-assign against broadcast centroids, then per-cluster
    element-wise mean via posexplode → (cluster, pos) avg → re-assembled
    array. Two hash aggregations per round, no RNG, no collect of the
    corpus (only the k centroids ever reach the driver's broadcast).

    ``checkpoint_every=N`` truncates the centroid lineage with an eager
    ``localCheckpoint`` every N Lloyd rounds: without it the plan doubles
    per round (each round re-derives the previous round's centroids from
    scratch), which is fine for the default 2 rounds but pathological for
    long convergence runs at scale. Centroids are only n_clusters rows,
    so the checkpoint itself is tiny."""
    vecs = corpus.select(F.col(id_col).alias("_id"), quantize(vec_col).alias("qvec"))

    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    # no full-corpus single-partition exchange); the row_number window
    # then runs over just n_clusters rows.
    seeds = vecs.orderBy("_id").limit(n_clusters)
    centroids = seeds.select(
        (F.row_number().over(Window.orderBy("_id")) - 1).alias("cluster"),
        F.col("qvec").alias("centroid"),
    )

    for i in range(n_iters):
        assigned = _assign(vecs, centroids)
        # Exact integer mean (r8): int64 sum + count, then round-half-
        # away-from-zero via pure integer arithmetic. The previous
        # round(avg(v)) accumulated the sum in DOUBLE, whose partition
        # order is not deterministic — a last-ulp drift could flip the
        # rounded centroid coordinate and silently change cell
        # membership between runs. Integer s/n is order-independent,
        # bit-identical on any engine, and makes the whole index
        # SQL-oracle-able.
        centroids = (
            assigned.select("cluster", F.posexplode("qvec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("v").cast("bigint").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cluster",
                "pos",
                F.expr(
                    "CASE WHEN s >= 0 THEN (2*s + n) div (2*n)"
                    " ELSE -((2*(-s) + n) div (2*n)) END"
                ).alias("m"),
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("bigint"),
                ).alias("centroid")
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            centroids = centroids.localCheckpoint(eager=True)

    assignments = assign_to_index(corpus, centroids, id_col, vec_col)
    return centroids, assignments


def extend_ivf_index(
    centroids: DataFrame,
    assignments: DataFrame,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """O(Δ·k) incremental index maintenance: assign ONLY the new
    ``delta`` vectors against the FROZEN centroids and append them to
    the existing assignments — no re-clustering, no touch of the base
    corpus. This is the arrival path at scale: a 100 TB index is built
    once (amortized) and each incoming batch costs Δ·k centroid
    distances, exactly like :func:`build_ivf_index`'s final assignment
    step but restricted to the delta. Because the base assignments were
    themselves produced by arg-min against these same centroids, the
    union equals assigning (base ∪ delta) against the frozen centroids
    — which is what makes the incremental index SQL-oracle-able and is
    pinned in tests/test_ivf.py. Recall drifts as the un-reclustered
    corpus grows; op-ext-ann-incr-recall is the monitor for exactly
    that (measured numbers in BASELINE.md r14)."""
    extra = assign_to_index(delta, centroids, id_col, vec_col)
    return centroids, assignments.unionByName(extra)


def save_ivf_index(
    centroids: DataFrame, assignments: DataFrame, path: str
) -> None:
    """Materialize the index as two parquet tables so later query batches
    skip k-means entirely (the build is offline/amortized at scale; the
    assignments table is the only corpus-sized artifact and is written
    partitioned by cluster so probing prunes to the probed cells)."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assignments.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/assignments"
    )


def load_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) read back from :func:`save_ivf_index` —
    plain parquet scans, zero k-means stages."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/assignments"),
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int | str = 16,
    n_probe: int = 4,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate cosine top-k through the IVF index: score each query
    against only the rows of its n_probe nearest cells. Same output
    contract as brute_force_cosine_topk; recall grows with n_probe
    (n_probe = n_clusters ≡ exact search).

    ``n_clusters="auto"`` sizes the cell count from the corpus/query
    row counts via :func:`auto_n_clusters` (two scalar count() jobs —
    the same justified-scalar class as watermark reads).

    Pass ``index=(centroids, assignments)`` (from :func:`build_ivf_index`
    or :func:`load_ivf_index`) to reuse a prebuilt index — repeated query
    batches then trigger no k-means stages at all."""
    if index is not None:
        # prebuilt index fixes the cell count — resolving "auto" here
        # would burn two count() jobs for a value that's never used
        centroids, assignments = index
    else:
        if n_clusters == "auto":
            n_clusters = auto_n_clusters(
                corpus.count(), queries.count(), n_probe=n_probe
            )
        centroids, assignments = build_ivf_index(
            corpus, id_col, vec_col, n_clusters
        )
    # persist (scope-owned): the cell lists feed the probe join; run under
    # cache_scope() — or save_ivf_index for cross-job reuse — to release.
    # Per-row norms are computed BEFORE the probe join (once per corpus
    # row / once per probe row) instead of per candidate pair — the
    # score expression is unchanged, so scores stay bit-identical; the
    # corpus-side norm rides the pinned cell frame.
    cells = pin(
        corpus.select(F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("cv"))
        .withColumn("_nc", F.sqrt(int_dot(F.col("cv"), F.col("cv")).cast("double")))
        .join(
            assignments.withColumnRenamed(id_col, "neighbor_id"), on="neighbor_id"
        )
    )
    q = queries.select(F.col(id_col).alias("query_id"), quantize(vec_col).alias("qvec"))
    probes = _assign(q, centroids, n_probe=n_probe).select(
        F.col("query_id"), F.col("qvec").alias("qv"), "cluster"
    ).withColumn("_nq", F.sqrt(int_dot(F.col("qv"), F.col("qv")).cast("double")))

    dot = int_dot(F.col("qv"), F.col("cv")).cast("double")
    scored = (
        cells.join(F.broadcast(probes), on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot / (F.col("_nq") * F.col("_nc"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
