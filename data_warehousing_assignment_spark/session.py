"""SparkSession factory + deterministic session configuration.

The reference delegates execution to pandas and the PostgreSQL planner; here
the equivalent "engine setup" is a SparkSession tuned for the warehouse
workload: AQE on (runtime re-planning, skew-join handling), lenient casts
(the reference's semantics are coerce-to-null — ``pd.to_numeric(...,
errors='coerce')``, reference ``02_Extract_and_transform_raw_data/
A2_hr_etl.py:57``), and a fixed UTC session timezone so date/timestamp
results are machine-independent.

At 100 TB these settings still hold: AQE coalesces post-shuffle partitions,
``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound, and all
determinism settings are scale-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session our queries run under
# (including a driver-owned session passed into ``entry``/``queries``).
_RUNTIME_CONFS: dict[str, str] = {
    # Reference semantics: failed casts coerce to NULL, never raise
    # (pandas errors='coerce'; PostgreSQL loaders guard with regex first).
    # Spark 4 defaults ANSI on; we use try_* functions everywhere AND turn
    # ANSI off so stray casts match the lenient reference behavior.
    "spark.sql.ansi.enabled": "false",
    # Deterministic date/timestamp rendering regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    # NOT set: coalescePartitions.initialPartitionNum — a global 1024
    # was tried in r11 (AQE can only merge partitions, never split
    # uniform-large ones, so a heavy array shuffle stays 32-wide and
    # OOMs); measured effect: iterative/checkpointed ops ran 2048-task
    # near-empty stages at sf0.001 that AQE did not coalesce. Heavy
    # array-carrying joins widen EXPLICITLY at the operator instead
    # (dedup.set_similarity_join_prefix's verify join, r11).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable determinism/perf confs to an existing session.

    Safe to call on a session we did not create (the driver's); every key
    here is runtime-mutable (no SparkContext restart needed).
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # e.g. conf made static in a future Spark — never fail a query
            # over a tuning knob.
            pass
    return spark


def scratch_table(spark: SparkSession, base: str) -> str:
    """Session-scoped catalog table name for rebuild-every-call scratch
    tables (the bucketed-join demos write real bucketed tables at query
    build). The name carries the Spark applicationId so two sessions
    sharing one metastore/warehouse dir can never clobber each other's
    tables mid-read (r8 advice — the previous fixed global names were a
    concurrent-session hazard).

    Also clears BOTH stale layers before handing the name out: the
    catalog entry (DROP TABLE) and, for local filesystem warehouses
    only, a stale orphaned table DIRECTORY (a killed session can leave
    the dir without the catalog row → LOCATION_ALREADY_EXISTS on the
    next write). The warehouse URI is parsed properly rather than
    string-stripping a 'file:' prefix; on non-file warehouses (hdfs/s3)
    DROP TABLE is the whole cleanup — Spark owns the remote dir.
    """
    import glob
    import re
    import shutil
    import time
    from urllib.parse import unquote, urlparse

    app = re.sub(
        r"[^0-9a-zA-Z]+", "_", spark.sparkContext.applicationId
    ).strip("_").lower()
    name = f"{base}_{app}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(wh)
    if parsed.scheme in ("", "file"):
        path = unquote(parsed.path) if parsed.scheme else wh
        own = os.path.join(path, name)
        shutil.rmtree(own, ignore_errors=True)
        # Stale-SIBLING sweep (r9 advice: app-suffixed names leak a dead
        # session's lineitem-sized tables into the warehouse forever),
        # with an AGE guard: a sibling dir younger than the cutoff is
        # plausibly a CONCURRENT session's LIVE table — deleting it
        # mid-read is exactly the clobber the app suffix exists to
        # prevent; older ones are dead sessions' leaks. The catalog
        # entry is dropped ONLY for dirs the age guard let us remove
        # (same rule for both layers — an unconditional catalog DROP of
        # every {base}_* sibling would clobber a live shared-metastore
        # session the same way).
        cutoff = 6 * 3600
        now = time.time()
        # Heartbeat OUR OWN sibling dirs for this base: directory mtime
        # does not refresh while a table is merely being READ, so a
        # long-lived session would look "stale" to a concurrent
        # session's sweep after 6h even though it is alive (r10 advice).
        # Touching every {base}_{app} dir belonging to THIS applicationId
        # on each reuse keeps live tables out of siblings' cutoffs.
        for own_dir in glob.glob(os.path.join(path, f"*_{app}")):
            try:
                os.utime(own_dir, None)
            except OSError:
                pass
        for stale_dir in glob.glob(os.path.join(path, f"{base}_*")):
            if stale_dir == own:
                continue
            try:
                if now - os.path.getmtime(stale_dir) > cutoff:
                    shutil.rmtree(stale_dir, ignore_errors=True)
                    if os.path.exists(stale_dir):
                        # rmtree(ignore_errors=True) silently failed
                        # (permissions, concurrent writer) — the data
                        # dir is still there, so the catalog entry must
                        # stay too or the owner loses its table while
                        # the files remain (r10 advice).
                        continue
                    tbl = os.path.basename(stale_dir)
                    if re.fullmatch(r"[a-z0-9_]+", tbl):
                        try:
                            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                        except Exception:
                            pass  # leak, not a correctness issue
            except OSError:
                pass
    return name


def get_spark(
    app_name: str = "data-warehousing-assignment-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession for the engine.

    Local test mode: ``local[$SPARK_GRAFT_CPUS or *]`` with a shuffle
    partition count matching core count — on a real cluster you would size
    shuffle partitions to ~128 MB of post-shuffle data per task and let AQE
    coalesce down.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep the UI off in test harnesses: faster startup, no port churn
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session: re-assert the
    # runtime confs so behavior is consistent either way.
    return apply_runtime_confs(spark)
