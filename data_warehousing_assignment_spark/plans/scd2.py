"""SCD Type 2 merge as a pure-functional DataFrame transform.

Reference algorithm (``03_load_into_fact_and_dim_tables/A3_load_dim_emp.sql:27-62``):
stamp an md5(concat_ws) row hash on staging, expire current dim rows whose
hash ``IS DISTINCT FROM`` the incoming hash (``valid_to = today,
is_current = false``), then insert new/changed rows (``valid_from = today,
valid_to = NULL, is_current = true``). The dbt variant is the
timestamp-strategy snapshot (``snapshots/scd2_dim_employee.sql:1-31``).

Spark-first design: no MERGE/UPDATE exists without a lakehouse format, so
the merge produces the four disjoint row sets — history, unchanged-open,
expired, inserts — and the caller overwrites the dim with the result.
The open-vs-incoming classification is ONE full-outer equi-join on the
natural key (r14: previously three separate key joins), so at 100 TB the
whole merge is a single co-partitioned shuffle stage (or zero if both
sides are bucketed on the key). Idempotent by construction: re-running
with the same incoming batch finds zero distinct hashes and returns the
input partition-for-partition.

Upgrade path: with Delta/Iceberg present this becomes a single
``MERGE INTO`` with the same hash predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Marker substituted for NULL attributes inside the row hash so that
#: (NULL, 'x') and ('x', NULL) hash differently (concat_ws would silently
#: drop the NULL and collapse the two).
_NULL_MARK = "\x00null\x00"

SCD2_COLS = ("row_hash", "valid_from", "valid_to", "is_current")


def scd2_row_hash(attrs: list[str | Column]) -> Column:
    """md5(concat_ws('::', ...)) change-detection hash over the tracked
    attributes (ref ``A3_load_dim_emp.sql:28``; dbt
    ``generate_surrogate_key``, ``stg_hr_employee.sql:10``), made
    null-total by coalescing each attribute to a marker first."""
    parts = [
        F.coalesce(
            (F.col(a) if isinstance(a, str) else a).cast("string"),
            F.lit(_NULL_MARK),
        )
        for a in attrs
    ]
    return F.md5(F.concat_ws("::", *parts))


def merge_scd2(
    current: DataFrame,
    incoming: DataFrame,
    key: str,
    attrs: list[str],
    as_of: str,
) -> DataFrame:
    """Merge an incoming attribute snapshot into an SCD2 dimension.

    ``current`` carries (key, *attrs, row_hash, valid_from, valid_to,
    is_current); ``incoming`` carries (key, *attrs) — at most one row per
    key. Returns the new full dimension content.

    Plan shape (r14 optimization round): ONE full-outer join of the open
    rows against the incoming batch classifies every key — (changed, new,
    unchanged, absent-from-batch) all fall out of side-presence plus the
    null-safe hash comparison — and each joined row emits its ≤2 output
    rows (the surviving/expired open row and/or the fresh insert) via a
    row-local array+explode. The previous formulation derived the same
    four row sets with THREE key joins (changed-keys inner, new-keys
    anti, plus semi/anti consumers) and re-evaluated the open-rows and
    incoming subtrees up to three times each — 6 exchanges at scale
    where the single full-outer join needs 2 (guide §2.4). Row-set
    equality with that formulation is pinned in tests/test_scd2.py; at
    most one open row per key (the documented contract) makes the two
    classifications identical.
    """
    inc = incoming.select(key, *attrs).withColumn("row_hash", scd2_row_hash(attrs))

    cur_open = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))

    c = cur_open.select(
        F.col(key),
        *[F.col(a).alias(f"_c_{a}") for a in attrs],
        F.col("row_hash").alias("_c_hash"),
        F.col("valid_from").alias("_c_from"),
        F.col("valid_to").alias("_c_to"),
        F.lit(True).alias("_c_present"),
    )
    i = inc.select(
        F.col(key),
        *[F.col(a).alias(f"_i_{a}") for a in attrs],
        F.col("row_hash").alias("_i_hash"),
        F.lit(True).alias("_i_present"),
    )
    j = c.join(i, on=key, how="full_outer")
    c_present = F.col("_c_present").isNotNull()
    i_present = F.col("_i_present").isNotNull()
    # Null-safe hash inequality = IS DISTINCT FROM (ref A3_load_dim_emp.sql:48,61)
    changed = (
        c_present
        & i_present
        & ~F.col("_c_hash").eqNullSafe(F.col("_i_hash"))
    )
    as_of_d = F.to_date(F.lit(as_of))

    open_row = F.when(
        c_present,
        F.struct(
            *[F.col(f"_c_{a}").alias(a) for a in attrs],
            F.col("_c_hash").alias("row_hash"),
            F.col("_c_from").alias("valid_from"),
            F.when(changed, as_of_d).otherwise(F.col("_c_to")).alias("valid_to"),
            (~changed).alias("is_current"),
        ),
    )
    insert_row = F.when(
        changed | (i_present & ~c_present),
        F.struct(
            *[F.col(f"_i_{a}").alias(a) for a in attrs],
            F.col("_i_hash").alias("row_hash"),
            as_of_d.alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        ),
    )
    cols = [key, *attrs, *SCD2_COLS]
    emitted = (
        j.select(
            F.col(key),
            F.explode(
                F.filter(
                    F.array(open_row, insert_row), lambda s: s.isNotNull()
                )
            ).alias("_r"),
        )
        .select(key, "_r.*")
        .select(cols)
    )
    return history.select(cols).unionByName(emitted)


def expire_deleted(
    current: DataFrame, deleted_keys: DataFrame, key: str, as_of: str
) -> DataFrame:
    """Close the open SCD2 row of every tombstoned key — the delete half
    of a CDC→SCD2 composition (Debezium op='d' has no analogue in the
    reference's snapshot-driven loads, which only ever see upserts; ref
    ``A3_load_dim_emp.sql:42-62`` expires strictly on attribute change).

    ``deleted_keys`` carries one column ``key``. A tombstoned key's open
    row gets ``valid_to = as_of, is_current = false``; history rows and
    untouched keys pass through bit-identical. A later re-insert of the
    key (via :func:`merge_scd2`) starts a fresh version — the validity
    gap between the closure and the re-insert is the real deletion
    window, which is why the contiguity invariant only applies to
    never-deleted keys.

    One equi-join on the natural key against the (typically tiny)
    tombstone set — same single-shuffle shape as the merge itself.
    """
    marks = (
        deleted_keys.select(key).distinct().withColumn("_del", F.lit(True))
    )
    hit = F.col("_del").isNotNull() & F.col("is_current")
    return (
        current.join(marks, on=key, how="left")
        .withColumn(
            "valid_to",
            F.when(hit, F.to_date(F.lit(as_of))).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.when(hit, F.lit(False)).otherwise(F.col("is_current")),
        )
        .drop("_del")
    )


def assert_scd2_invariants(dim: DataFrame, key: str) -> dict[str, int]:
    """Sanity counters for tests: violations of '≤1 current row per key'
    and 'valid_from ≤ valid_to'. Returns counts (0 = healthy)."""
    multi_current = (
        dim.filter(F.col("is_current"))
        .groupBy(key)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    bad_range = dim.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_from") > F.col("valid_to"))
    ).count()
    # Contiguity: within a key's history ordered by valid_from, every
    # non-last version must close exactly where the next one opens
    # (valid_to = next valid_from, never NULL mid-chain) — the
    # cross-batch shape of the reference's expire-then-insert
    # (A3_load_dim_emp.sql:42-62).
    w = Window.partitionBy(key).orderBy("valid_from")
    broken_chain = (
        dim.withColumn("_next_from", F.lead("valid_from").over(w))
        .filter(
            F.col("_next_from").isNotNull()
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") != F.col("_next_from"))
            )
        )
        .count()
    )
    return {
        "multi_current_keys": multi_current,
        "bad_valid_ranges": bad_range,
        "broken_chains": broken_chain,
    }
