"""Role-scoped access (ref ``01_DW_schema_and_roles_creation/
User_roles.sql:1-60`` and the KPI grants ``04_KPI/KPIs.sql:115-120``).

The reference grants Postgres roles SELECT on specific views (hr_analyst
→ HR KPIs, finance_analyst → expense KPIs, ops_analyst → downtime KPIs).
OSS Spark has no SQL GRANT machinery (that lives in Ranger/Unity at the
platform layer), so the equivalent engine-level capability is expressed
as data: a role → view allowlist enforced at resolution time, plus
row-filter and column-mask hooks — the same primitives a governed
catalog compiles grants into.

Everything here is plain DataFrame composition: a masked view is just a
projection with replaced columns, a row policy is a filter — Catalyst
still pushes consumer predicates through them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sentinel for unrestricted SELECT (dw_admin). Distinct from an empty
#: grant set, which means DENY-ALL — a role added with no grants yet must
#: not silently inherit superuser reads (fail-closed).
ALL_VIEWS = None

#: Reference grant matrix (ref User_roles.sql:16-32, KPIs.sql:115-120).
ROLE_GRANTS: dict[str, frozenset[str] | None] = {
    "hr_analyst": frozenset(
        {"vw_kpi_headcount", "vw_kpi_resignations", "vw_kpi_avg_salary_by_gender"}
    ),
    "finance_analyst": frozenset(
        {
            "vw_kpi_gross_monthly_expenses",
            "vw_kpi_net_monthly_expenses_by_dept",
            "vw_kpi_net_monthly_expenses_by_expense",
        }
    ),
    "ops_analyst": frozenset(
        {"vw_kpi_downtime_by_process", "vw_kpi_downtime_by_department"}
    ),
    "dw_admin": ALL_VIEWS,  # unrestricted (ref User_roles.sql:7-9)
}


class AccessDenied(PermissionError):
    pass


def check_grant(role: str, view_name: str) -> None:
    """Raise AccessDenied unless `role` may read `view_name` (the
    ALL_VIEWS sentinel marks the reference's superuser-ish dw_admin;
    an empty grant set denies everything)."""
    if role not in ROLE_GRANTS:
        raise AccessDenied(f"unknown role: {role}")
    allowed = ROLE_GRANTS[role]
    if allowed is ALL_VIEWS:
        return
    if view_name not in allowed:
        raise AccessDenied(f"role {role} has no SELECT on {view_name}")


def resolve_view(
    role: str,
    view_name: str,
    views: dict[str, Callable[[], DataFrame]],
) -> DataFrame:
    """Grant-checked view resolution: the engine-level shape of the
    reference's `GRANT SELECT ON dw.vw_kpi_* TO role`."""
    check_grant(role, view_name)
    if view_name not in views:
        raise KeyError(view_name)
    return views[view_name]()


def with_column_mask(
    df: DataFrame, masks: dict[str, Column]
) -> DataFrame:
    """Column masking (e.g. salary → NULL for non-HR readers): replace
    each masked column's expression, keep the schema. Masks are plain
    projections, so consumer filters still push through."""
    return df.select(
        *[
            masks[c].cast(df.schema[c].dataType).alias(c) if c in masks else F.col(c)
            for c in df.columns
        ]
    )


def with_row_policy(df: DataFrame, predicate: Column) -> DataFrame:
    """Row-level policy (e.g. a department-scoped analyst): a filter the
    optimizer can merge with the consumer's own predicates."""
    return df.filter(predicate)
