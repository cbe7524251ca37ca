"""Streaming sinks: foreachBatch incremental fact loading.

The production pattern for feeding a warehouse from a stream: each
micro-batch runs the SAME incremental-insert plan the batch loader uses
(``plans/facts.incremental_fact_insert`` — full-row anti-join dedup with
a date/partition prune), so replays, overlapping batches, and at-least-
once sources all collapse to exactly-once fact contents. This is the
streaming twin of the reference's NOT-EXISTS loader (ref
``B3_load_fin_facts.sql:84-94``) — which, being batch-only, re-ran the
full dedup scan per load; here the prune keeps each micro-batch's
anti-join bounded by its own time window.

At 100 TB: the fact is written date-partitioned (writers.write_table
partition_by), so the per-batch existing-side scan prunes to the touched
partitions; checkpointing makes the foreachBatch idempotence a second
line of defense rather than the only one."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from data_warehousing_assignment_spark.plans.facts import incremental_fact_insert


def start_incremental_fact_sink(
    stream: DataFrame,
    fact_path: str,
    dedup_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Start a foreachBatch query appending only fact rows not already
    present (full-row dedup by default). Returns the StreamingQuery;
    callers trigger/await as needed."""
    spark = stream.sparkSession

    def _has_committed_data(fs, jvm_path) -> bool:
        # A directory can exist with NOTHING committed (a first write that
        # died after mkdir, or stray _temporary/metadata files). Probing
        # for actual part-files distinguishes that from real data: if none
        # exist, nothing was committed, so an empty existing side cannot
        # double-load — while treating it as readable would poison every
        # retry with the same schema-inference error forever.
        #
        # Only VISIBLE part-files count: a crashed first attempt leaves
        # part-* under _temporary/, which spark.read.parquet ignores (its
        # InMemoryFileIndex pathFilter skips any '_'/'.'-prefixed path
        # segment) — counting those would declare data committed while the
        # reader finds no footers, poisoning every retry.
        root = fs.makeQualified(jvm_path).toString().rstrip("/")
        it = fs.listFiles(jvm_path, True)  # recursive — partitioned layouts
        while it.hasNext():
            fpath = it.next().getPath().toString()
            rel = fpath[len(root):].lstrip("/") if fpath.startswith(root) else fpath
            segments = rel.split("/")
            if any(s.startswith(("_", ".")) for s in segments[:-1]):
                continue  # inside a hidden dir (_temporary, .staging, ...)
            if segments[-1].startswith("part-"):
                return True
        return False

    def load_batch(batch: DataFrame, batch_id: int) -> None:
        # Probe existence explicitly: only "nothing committed yet" may
        # fall back to an empty existing side. A transient read failure on
        # REAL data must still ABORT the batch — treating it as
        # first-batch would skip the anti-join dedup and silently
        # double-load on retry.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(fact_path)  # type: ignore[union-attr]
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        if fs.exists(jvm_path) and _has_committed_data(fs, jvm_path):
            existing = spark.read.parquet(fact_path).select(*batch.columns)
        else:
            existing = batch.limit(0)
        fresh = incremental_fact_insert(existing, batch, dedup_cols)
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(fact_path)

    writer = stream.writeStream.foreachBatch(load_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
