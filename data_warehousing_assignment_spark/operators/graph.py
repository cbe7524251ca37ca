"""Iterative graph operators for dedup clustering (extension surface,
SURVEY.md §7.5 — no reference counterpart; the reference's dedup stops
at pandas drop_duplicates, ref ``ET_combined.py:118-132``).

Near-duplicate detection yields PAIRS (MinHash-LSH candidates verified
by n-gram Jaccard, operators/dedup.py); a training-data pipeline needs
CLUSTERS — "these 5 documents are all the same article" — so it can keep
one representative per group. That is connected components over the
pair graph.

Scale design: min-label propagation, the classic Pregel formulation.
Each iteration is one distributed join + one map-side-combinable min
aggregation — shuffle keyed by node id, never materializing anything
super-linear in |edges|. Iteration count is bounded by the component
DIAMETER, and near-dup clusters are dense blobs (diameter ≤ ~3), so the
loop converges in a handful of rounds even at 100 TB. For adversarial
long-chain graphs the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log n) rounds with the same per-round shuffle shape; propagation is
kept here because the dedup workload never produces deep chains and the
constant factor per round is half.

The driver-side ``while`` loop is inherent to iterative graph
algorithms (GraphX/GraphFrames do the same): each iteration is fully
distributed; the only driver data is the 1-scalar convergence count.
``localCheckpoint`` truncates the lineage each round so the plan does
not grow exponentially with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.caching import pin


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it
    (undirected reachability over ``edges``); isolated nodes label
    themselves. Returns ``(id_col, component)``.

    min-label propagation: ``label(v) <- min(label(v), min over
    neighbors u of label(u))`` until a fixpoint. Deterministic — the
    fixpoint (min reachable id) is unique regardless of iteration
    order, which is what makes an exact DuckDB recursive-CTE oracle
    possible (registry_extensions.py: op-ext-dedup-clusters).
    """
    # Symmetric edge list — propagation must flow both directions.
    # PINNED: the incoming `edges` is typically an expensive pipeline
    # (minhash → LSH bucket join → Jaccard verify); joined once per
    # iteration, an unpersisted plan would re-run that whole pipeline
    # every round (benchmarked 30 s → 4 s at the 10× probe).
    fwd = edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
    sym = pin(
        fwd.union(fwd.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
    )

    labels = nodes.select(
        F.col(id_col).alias("_node"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["_a"] == labels["_node"])
            .groupBy("_b")
            .agg(F.min("component").alias("_nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["_node"] == neighbor_min["_b"], "left")
            .select(
                "_node",
                F.least(
                    F.col("component"), F.coalesce("_nmin", F.col("component"))
                ).alias("component"),
                (F.col("_nmin") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        # one tiny driver scalar per round — the convergence probe
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break

    return labels.withColumnRenamed("_node", id_col)


def component_summary(components: DataFrame, id_col: str = "id") -> DataFrame:
    """Per-cluster rollup of :func:`connected_components` output:
    ``(component, group_size)`` — the component label IS the surviving
    representative (min id), so dedup = keep rows where
    ``id == component``. One map-side-combined count aggregation."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
