"""In-engine statistics/ML registry: closed-form OLS regression,
lagged autocorrelation, and a bag-of-words posterior-vote text
classifier — the models a warehouse answers WITHOUT exporting data,
each expressed as exact-sum aggregations so results cross the engine
boundary bit-identically (registry.py rules: exact integer/decimal
sufficient statistics; wide ratios surface as fixed-point integers via
sign-abs exact decimal division, never wide-int→double casts whose last
ulp differs between engines).

No reference counterpart (SURVEY.md §7.5 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehousing_assignment_spark.operators.text import tokens
from data_warehousing_assignment_spark.registry import query, sum_cents, t

#: DuckDB twin of operators.text.tokens()
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


def _sdiv(a, b):
    """Exact scaled integer division of wide decimals, sign-abs so both
    engines agree on negatives (Spark `div`/DuckDB `//` both truncate
    toward zero for ints, but neither takes decimal(38,0) operands —
    int64 would overflow first). For nonneg p, q: p div q is computed
    as (p - p % q) / q, whose decimal division is EXACT because the
    numerator is a multiple of q."""
    aa = F.abs(a).cast("decimal(38,0)")
    bb = b.cast("decimal(38,0)")
    q = ((aa - aa % bb) / bb).cast("decimal(38,0)")
    return F.when(a < 0, -q).otherwise(q)


# --------------------------------------------------------------------------
# closed-form simple linear regression
# --------------------------------------------------------------------------


@query(
    "op-ext-linreg",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag, l_shipdate AS d,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS y
      FROM lineitem GROUP BY 1, 2
    ),
    xy AS (
      SELECT flag,
             date_diff('day', MIN(d) OVER (PARTITION BY flag), d) AS x, y
      FROM daily
    ),
    s AS (
      SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM xy GROUP BY 1
    ),
    q AS (
      SELECT flag, n, sx, sy,
             n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      FROM s
    ),
    sl AS (
      SELECT flag, n, sx, sy, den,
             CASE WHEN num < 0 THEN -(((-num) * 1000000) // den)
                  ELSE (num * 1000000) // den END AS slope_x1e6
      FROM q
    )
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n_days,
           CAST(slope_x1e6 AS BIGINT) AS slope_x1e6,
           CAST(CASE WHEN sy * 1000000 - slope_x1e6 * sx < 0
                  THEN -((-(sy * 1000000 - slope_x1e6 * sx)) // n)
                  ELSE (sy * 1000000 - slope_x1e6 * sx) // n END
                AS BIGINT) AS intercept_x1e6
    FROM sl
    """,
)
def op_ext_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend per return flag: regress daily revenue
    cents on the day index (days since the series start). The
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT decimal sums
    — order-independent — and slope/intercept surface as fixed-point
    ×10⁶ integers via sign-abs exact decimal division (_sdiv): a wide
    int → double conversion differs in the last ulp between engines,
    so no double ever crosses the boundary here.
    This is the map-side-combinable formulation (each partition emits
    its partial sums; the merge is +), i.e. the only OLS that scales:
    no gram-matrix collect, no driver math. Slope in cents/day is the
    drift KPI a finance close watches."""
    li = t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").alias("d"),
    ).agg(sum_cents("l_extendedprice").alias("y"))
    wf = Window.partitionBy("flag")
    xy = daily.select(
        "flag",
        F.datediff("d", F.min("d").over(wf)).cast("long").alias("x"),
        "y",
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = xy.groupBy("flag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(dec("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
    )
    q = s.select(
        "flag",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    sl = q.withColumn(
        "slope_x1e6", _sdiv(F.col("num") * F.lit(1000000), F.col("den"))
    )
    return sl.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("slope_x1e6").cast("bigint").alias("slope_x1e6"),
        _sdiv(
            F.col("sy") * F.lit(1000000) - F.col("slope_x1e6") * F.col("sx"),
            F.col("n"),
        )
        .cast("bigint")
        .alias("intercept_x1e6"),
    )


# --------------------------------------------------------------------------
# lagged autocorrelation
# --------------------------------------------------------------------------


@query(
    "op-ext-autocorr",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag, l_shipdate AS d,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS y
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT flag, d, y,
             CAST(SUM(y) OVER (PARTITION BY flag) AS BIGINT)
               // CAST(COUNT(*) OVER (PARTITION BY flag) AS BIGINT) AS mu
      FROM daily
    ),
    r AS (
      SELECT flag, d, y - mu AS res,
             lead(y - mu, 1) OVER (PARTITION BY flag ORDER BY d) AS res1,
             lead(y - mu, 7) OVER (PARTITION BY flag ORDER BY d) AS res7
      FROM m
    ),
    den AS (SELECT flag,
                   CAST(SUM(CAST(res AS HUGEINT) * res) AS HUGEINT) AS ss
            FROM r GROUP BY 1),
    num AS (
      SELECT flag, 1 AS lag_k,
             CAST(COUNT(res1) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(res AS HUGEINT) * res1) AS HUGEINT) AS sp
      FROM r WHERE res1 IS NOT NULL GROUP BY 1
      UNION ALL
      SELECT flag, 7,
             CAST(COUNT(res7) AS BIGINT),
             CAST(SUM(CAST(res AS HUGEINT) * res7) AS HUGEINT)
      FROM r WHERE res7 IS NOT NULL GROUP BY 1
    )
    SELECT n.flag AS l_returnflag, CAST(n.lag_k AS BIGINT) AS lag_k,
           n.n_pairs,
           CAST(CASE WHEN n.sp < 0
                  THEN -(((-n.sp) * 1000000000) // d.ss)
                  ELSE (n.sp * 1000000000) // d.ss END
                AS BIGINT) AS autocorr_x1e9
    FROM num n JOIN den d ON n.flag = d.flag
    """,
)
def op_ext_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily revenue per return flag
    — the "is there weekly seasonality worth modeling" screen that
    picks thresholds for op-ext-seasonal-anomaly. Residual products sum
    in exact decimal(38,0) (int64 would overflow at 10× revenue:
    (10⁸)²·2500 days ≈ 2.5·10¹⁹); the coefficient surfaces as a
    fixed-point ×10⁹ integer via sign-abs exact division (_sdiv — wide
    int→double conversions differ in the last ulp across engines). The
    lead() windows run over the post-aggregate daily frame partitioned
    by flag — never raw lineitem."""
    li = t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").alias("d"),
    ).agg(sum_cents("l_extendedprice").alias("y"))
    m = daily.select(
        "flag",
        "d",
        "y",
        F.expr(
            "CAST(sum(y) OVER (PARTITION BY flag) AS BIGINT)"
            " div CAST(count(1) OVER (PARTITION BY flag) AS BIGINT)"
        ).alias("mu"),
    )
    w = Window.partitionBy("flag").orderBy("d")
    r = m.select(
        "flag",
        (F.col("y") - F.col("mu")).alias("res"),
        F.lead(F.col("y") - F.col("mu"), 1).over(w).alias("res1"),
        F.lead(F.col("y") - F.col("mu"), 7).over(w).alias("res7"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    den = r.groupBy("flag").agg(
        F.sum(dec("res") * dec("res")).cast("decimal(38,0)").alias("ss")
    )
    num1 = (
        r.filter(F.col("res1").isNotNull())
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dec("res") * dec("res1")).cast("decimal(38,0)").alias("sp"),
        )
        .withColumn("lag_k", F.lit(1).cast("bigint"))
    )
    num7 = (
        r.filter(F.col("res7").isNotNull())
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dec("res") * dec("res7")).cast("decimal(38,0)").alias("sp"),
        )
        .withColumn("lag_k", F.lit(7).cast("bigint"))
    )
    num = num1.unionByName(num7)
    return num.join(den, "flag").select(
        F.col("flag").alias("l_returnflag"),
        "lag_k",
        "n_pairs",
        _sdiv(F.col("sp") * F.lit(1000000000), F.col("ss"))
        .cast("bigint")
        .alias("autocorr_x1e9"),
    )


# --------------------------------------------------------------------------
# Naive Bayes text classifier
# --------------------------------------------------------------------------


@query(
    "op-ext-text-classify",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS l FROM documents),
    tok AS (SELECT doc_id, lang, unnest(l) AS w FROM t),
    cwc AS (SELECT w, lang AS cls, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok GROUP BY 1, 2),
    cw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt_w
           FROM tok GROUP BY 1),
    ncls AS (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS k FROM tok),
    cls AS (SELECT DISTINCT lang AS cls FROM tok),
    fan AS (
      SELECT tok.doc_id, tok.lang AS actual_lang, tok.w, cls.cls
      FROM tok CROSS JOIN cls
    ),
    scored AS (
      SELECT f.doc_id, f.actual_lang, f.cls,
             CAST(SUM((1000000 * (COALESCE(c.cnt, 0) + 1))
                      // (cw.cnt_w + ncls.k)) AS BIGINT) AS score_ppm
      FROM fan f
      LEFT JOIN cwc c ON f.w = c.w AND f.cls = c.cls
      JOIN cw ON f.w = cw.w
      CROSS JOIN ncls
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT doc_id, actual_lang, cls, score_ppm,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_ppm DESC, cls) AS rk
      FROM scored
    )
    SELECT doc_id, cls AS predicted_lang, actual_lang,
           cls = actual_lang AS correct
    FROM ranked WHERE rk = 1
    """,
)
def op_ext_text_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words posterior-vote language classifier trained and
    applied in-engine (the linear count-based classifier family behind
    fastText-style lang-id, next to the heuristic op-ext-lang-id):
    each document token votes its smoothed word→class posterior
    P(cls|w) = (c(w,cls)+1)/(c(w)+k) in fixed-point ppm (integer floor
    division — engine-exact; true log-likelihood NB needs ln, whose
    last ulp differs across engines, so the decision rule is the
    posterior-vote ensemble instead — shared words vote ≈uniformly and
    cancel, discriminative words decide). Train = one (token, class)
    count over the corpus; classify = each doc's tokens fanned out ×
    the broadcast class frame against the count table, one
    per-(doc, class) rollup, one per-doc ranking window. In-sample by
    design (the demo is the PLAN shape; swap the train scan for a
    labeled split via op-ext-hash-split). Accuracy is pinned >> chance
    in tests/test_warehouse_wave.py — near ceiling here because the
    synthetic corpus carries only a weak lexical language signal."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("actual_lang"), tokens("text").alias("l")
    )
    tok = docs.select(
        "doc_id", "actual_lang", F.explode("l").alias("w")
    )
    cwc = tok.groupBy(
        F.col("w"), F.col("actual_lang").alias("cls")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt_w"))
    ncls = tok.agg(F.countDistinct("actual_lang").alias("k"))
    cls = tok.select(F.col("actual_lang").alias("cls")).distinct()
    fan = tok.crossJoin(F.broadcast(cls))
    scored = (
        fan.join(cwc, ["w", "cls"], "left")
        .join(cw, "w")
        .crossJoin(F.broadcast(ncls))
        .groupBy("doc_id", "actual_lang", "cls")
        .agg(
            F.sum(
                F.expr("(1000000 * (coalesce(cnt, 0) + 1)) div (cnt_w + k)")
            )
            .cast("bigint")
            .alias("score_ppm")
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("score_ppm"), F.asc("cls")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("cls").alias("predicted_lang"),
            "actual_lang",
            (F.col("cls") == F.col("actual_lang")).alias("correct"),
        )
    )
