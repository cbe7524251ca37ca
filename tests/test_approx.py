"""approx_count_distinct: HLL estimate within its configured error bound
of the exact grouped distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehousing_assignment_spark.registry import t
from tests.conftest import SF_SMALL


def test_approx_count_distinct_within_rsd(spark):
    orders = t(spark, SF_SMALL, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    exact = {
        r.order_month: r.n
        for r in orders.groupBy(month)
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.order_month: r.n
        for r in orders.groupBy(month)
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for m, n in exact.items():
        # 1% rsd → allow 5 sigma plus integer slack on small groups
        assert abs(approx[m] - n) <= max(0.05 * n, 2), (m, n, approx[m])
