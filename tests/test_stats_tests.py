"""Classical-hypothesis-test operators (round 9b): Welch's t,
Mann-Whitney U, Gini impurity, cume_dist — each replayed against an
independent numpy/pure-Python reference on the same sf0.001 inputs.
The DuckDB oracles prove cross-engine bit-identity; these tests prove
the STATISTICS are the textbook formulas (an oracle that shared a bug
with the query would still hash-match)."""

from __future__ import annotations

import math

import numpy as np

from data_warehousing_assignment_spark.registry import all_queries
from tests.conftest import SF_SMALL


def _run(spark, name):
    return all_queries()[name](spark, SF_SMALL).collect()


def test_welch_ttest_matches_numpy(spark):
    [row] = _run(spark, "op-ext-welch-ttest")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    a = np.array(
        [r.l_quantity for r in li if r.l_returnflag == "A"], dtype=np.float64
    )
    b = np.array(
        [r.l_quantity for r in li if r.l_returnflag == "R"], dtype=np.float64
    )
    assert row.n_a == len(a) and row.n_b == len(b)
    se_a = a.var(ddof=1) / len(a)
    se_b = b.var(ddof=1) / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se_a + se_b)
    df_ref = (se_a + se_b) ** 2 / (
        se_a**2 / (len(a) - 1) + se_b**2 / (len(b) - 1)
    )
    assert math.isclose(row.mean_a, a.mean(), rel_tol=1e-12)
    assert math.isclose(row.t_stat, t_ref, rel_tol=1e-9)
    assert math.isclose(row.df, df_ref, rel_tol=1e-9)
    # df must land between min(n-1) and n_a+n_b-2 (Welch bounds)
    assert min(len(a), len(b)) - 1 <= row.df <= len(a) + len(b) - 2


def test_mannwhitney_matches_rank_replay(spark):
    """Replay U and the tie-corrected z with a literal average-rank
    assignment (scipy-free)."""
    [row] = _run(spark, "op-ext-mannwhitney")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    a = [r.value for r in ev if r.event_type == "purchase"]
    b = [r.value for r in ev if r.event_type == "view"]
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(pooled)
    # average ranks with ties
    ranks = {}
    i = 0
    tie3 = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t_size = j - i
        tie3 += t_size**3 - t_size
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks[pooled[i][0]] = avg
        i = j
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u2_a == round(2 * u_a)
    assert row.tie3 == tie3
    mu = len(a) * len(b) / 2.0
    var = (
        len(a)
        * len(b)
        / 12.0
        * ((n + 1) - tie3 / (n * (n - 1)))
    )
    z_ref = (u_a - mu) / math.sqrt(var)
    assert math.isclose(row.z_score, z_ref, rel_tol=1e-9)


def test_gini_impurity_bounds_and_replay(spark):
    rows = _run(spark, "op-ext-gini-impurity")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    from collections import Counter

    by_seg = {}
    for r in ev:
        by_seg.setdefault(r.user_id % 8, Counter())[r.event_type] += 1
    assert len(rows) == len(by_seg)
    for r in rows:
        c = by_seg[r.segment]
        n = sum(c.values())
        ref = 1.0 - sum(v * v for v in c.values()) / (n * n)
        assert r.n_events == n and r.n_types == len(c)
        assert math.isclose(r.gini_impurity, ref, rel_tol=1e-12)
        # k-class impurity is bounded by 1 - 1/k
        assert 0.0 <= r.gini_impurity <= 1.0 - 1.0 / len(c) + 1e-12


def test_cume_dist_is_rank_over_n(spark):
    rows = _run(spark, "op-ext-cume-dist")
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: (r.c_acctbal, r.c_custkey))
        n = len(rs)
        for i, r in enumerate(rs):
            assert math.isclose(r.cd, (i + 1) / n, rel_tol=1e-12)
        # second_poorest is constant across the partition
        names = {r.second_poorest for r in rs}
        assert len(names) == 1


def test_spearman_matches_rank_replay(spark):
    """Replay rho per group with literal average-rank assignment and
    float Pearson-on-ranks (scipy-free); also check the exact-integer
    invariant Σcx = Σcy = 0 that centering guarantees."""
    rows = {
        (r.flag, r.mon): r for r in _run(spark, "op-ext-spearman")
    }
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        key = (r.l_returnflag, r.l_shipdate.strftime("%Y-%m"))
        cents = round(float(r.l_extendedprice) * 100)
        groups.setdefault(key, []).append((int(r.l_quantity), cents))
    assert set(rows) == set(groups)

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while (
                j < len(vals)
                and vals[order[j]] == vals[order[i]]
            ):
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    checked = 0
    for key, pts in groups.items():
        row = rows[key]
        assert row.n == len(pts)
        rx = avg_ranks([p[0] for p in pts])
        ry = avg_ranks([p[1] for p in pts])
        n = len(pts)
        cx = [2 * r - (n + 1) for r in rx]
        cy = [2 * r - (n + 1) for r in ry]
        assert abs(sum(cx)) < 1e-9 and abs(sum(cy)) < 1e-9
        scxy = sum(a * b for a, b in zip(cx, cy))
        scx2 = sum(a * a for a in cx)
        scy2 = sum(b * b for b in cy)
        assert row.scxy == round(scxy)
        assert row.scx2 == round(scx2)
        assert row.scy2 == round(scy2)
        if scx2 > 0 and scy2 > 0:
            rho_ref = scxy / math.sqrt(scx2 * scy2)
            assert math.isclose(row.rho, rho_ref, rel_tol=1e-9), key
            assert -1.0 - 1e-12 <= row.rho <= 1.0 + 1e-12
            checked += 1
    assert checked > 50  # quantity & price are correlated: most groups real


def test_kruskal_wallis_matches_rank_replay(spark):
    """Replay H and the tie-corrected H' with literal pooled average
    ranks (scipy-free)."""
    [row] = _run(spark, "op-ext-kruskal-wallis")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    samples = {
        g: [r.value for r in ev if r.event_type == g]
        for g in ("click", "purchase", "view")
    }
    pooled = sorted(
        (v, g) for g, vs in samples.items() for v in vs
    )
    n = len(pooled)
    ranks = {}
    tie3 = 0
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t_size = j - i
        tie3 += t_size**3 - t_size
        ranks[pooled[i][0]] = (i + 1 + j) / 2.0
        i = j
    r_sums = {
        g: sum(ranks[v] for v in vs) for g, vs in samples.items()
    }
    h_ref = (
        12.0 / (n * (n + 1))
        * sum(r_sums[g] ** 2 / len(samples[g]) for g in samples)
        - 3.0 * (n + 1)
    )
    c_ref = 1.0 - tie3 / float(n**3 - n)
    assert (row.n_a, row.n_b, row.n_c) == tuple(
        len(samples[g]) for g in ("click", "purchase", "view")
    )
    assert row.tie3 == tie3
    assert math.isclose(row.h_stat, h_ref, rel_tol=1e-9)
    assert math.isclose(row.h_tie_corrected, h_ref / c_ref, rel_tol=1e-9)
    assert row.h_tie_corrected >= row.h_stat  # ties only shrink variance


def test_auc_matches_rank_replay(spark):
    """Replay the midrank AUC with a literal average-rank pass over
    (score, y) pairs — the distributed prefix formulation must equal
    the textbook Mann-Whitney AUC exactly (ppm floor division)."""
    [row] = _run(spark, "op-ext-auc")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    resp = {r.o_custkey for r in orders if r.o_orderdate.year == 1997}
    pts = [
        (round(float(c.c_acctbal) * 100), 1 if c.c_custkey in resp else 0)
        for c in cust
    ]
    pts.sort()
    n = len(pts)
    pos_mr2 = 0
    i = 0
    while i < n:
        j = i
        while j < n and pts[j][0] == pts[i][0]:
            j += 1
        mr2 = (i + 1) + j  # min rank + max rank of the tie group
        pos_mr2 += mr2 * sum(y for _, y in pts[i:j])
        i = j
    p = sum(y for _, y in pts)
    neg = n - p
    assert (row.n_pos, row.n_neg) == (p, neg)
    assert row.auc_ppm == (1_000_000 * (pos_mr2 - p * (p + 1))) // (
        2 * p * neg
    )


def test_ks_test_matches_cdf_replay(spark):
    [row] = _run(spark, "op-ext-ks-test")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    a = sorted(
        round(float(o.o_totalprice) * 100)
        for o in orders
        if o.o_orderdate.year == 1995
    )
    b = sorted(
        round(float(o.o_totalprice) * 100)
        for o in orders
        if o.o_orderdate.year == 1996
    )
    import bisect

    support = sorted(set(a) | set(b))
    d = max(
        abs(
            (1_000_000 * bisect.bisect_right(a, v)) // len(a)
            - (1_000_000 * bisect.bisect_right(b, v)) // len(b)
        )
        for v in support
    )
    assert (row.n_1995, row.n_1996) == (len(a), len(b))
    assert row.ks_d_ppm == d


def test_wilcoxon_signed_rank_matches_rank_replay(spark):
    """Replay W+ and the tie-corrected z with literal average ranks
    over |diff| (scipy-free)."""
    [row] = _run(spark, "op-ext-wilcoxon-signed-rank")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    per = {}
    for o in orders:
        yr = o.o_orderdate.year
        if yr in (1995, 1996):
            c = per.setdefault(o.o_custkey, [0, 0, 0, 0])
            cents = round(float(o.o_totalprice) * 100)
            if yr == 1995:
                c[0] += cents; c[2] += 1
            else:
                c[1] += cents; c[3] += 1
    diffs = [
        c96 - c95
        for c95, c96, n95, n96 in per.values()
        if n95 > 0 and n96 > 0 and c95 != c96
    ]
    srt = sorted(abs(d) for d in diffs)
    n = len(diffs)
    ranks = {}
    tie3 = 0
    i = 0
    while i < n:
        j = i
        while j < n and srt[j] == srt[i]:
            j += 1
        t_size = j - i
        tie3 += t_size**3 - t_size
        ranks[srt[i]] = (i + 1 + j) / 2.0
        i = j
    w_pos = sum(ranks[abs(d)] for d in diffs if d > 0)
    assert row.n_pairs == n
    assert row.n_pos == sum(1 for d in diffs if d > 0)
    assert row.w2_pos == round(2 * w_pos)
    assert row.tie3 == tie3
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0)
    z_ref = (w_pos - n * (n + 1) / 4.0) / sigma
    assert math.isclose(row.z_score, z_ref, rel_tol=1e-9)


def test_mcnemar_matches_table_replay(spark):
    [row] = _run(spark, "op-ext-mcnemar")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    act95 = {o.o_custkey for o in orders if o.o_orderdate.year == 1995}
    act96 = {o.o_custkey for o in orders if o.o_orderdate.year == 1996}
    table = {(0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0}
    for c in cust:
        table[
            (int(c.c_custkey in act95), int(c.c_custkey in act96))
        ] += 1
    assert (row.n00, row.n01, row.n10, row.n11) == (
        table[(0, 0)], table[(0, 1)], table[(1, 0)], table[(1, 1)]
    )
    b, c_ = table[(1, 0)], table[(0, 1)]
    assert math.isclose(
        row.chi2_cc, (abs(b - c_) - 1) ** 2 / (b + c_), rel_tol=1e-12
    )


def test_friedman_matches_rank_replay(spark):
    [row] = _run(spark, "op-ext-friedman")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    per = {}
    for o in orders:
        yr = o.o_orderdate.year
        if yr in (1995, 1996, 1997):
            per.setdefault(o.o_custkey, {1995: 0, 1996: 0, 1997: 0})
            per[o.o_custkey][yr] += round(float(o.o_totalprice) * 100)
    per = {
        c: v
        for c, v in per.items()
        if all(
            any(
                o.o_custkey == c and o.o_orderdate.year == yr
                for o in orders
            )
            for yr in (1995, 1996, 1997)
        )
    }
    n = len(per)
    r2 = {1995: 0, 1996: 0, 1997: 0}
    tie3 = 0
    for c, v in per.items():
        vals = sorted(v.values())
        for yr in (1995, 1996, 1997):
            lo = 1 + sum(1 for x in vals if x < v[yr])
            hi = sum(1 for x in vals if x <= v[yr])
            r2[yr] += lo + hi  # min rank + max rank = doubled avg rank
        from collections import Counter

        for t_size in Counter(vals).values():
            tie3 += t_size**3 - t_size
    assert row.n == n and row.tie3 == tie3
    assert (row.r2_95, row.r2_96, row.r2_97) == (
        r2[1995], r2[1996], r2[1997]
    )
    chi2 = sum(x * x for x in r2.values()) / (4.0 * n) - 12.0 * n
    assert math.isclose(row.chi2, chi2, rel_tol=1e-9)
    assert math.isclose(
        row.chi2_tied, chi2 / (1 - tie3 / (24.0 * n)), rel_tol=1e-9
    )


def test_jonckheere_matches_pairwise_replay(spark):
    """Replay 2J as the literal tie-aware pairwise count
    (2·#(earlier < later) + #(equal)) over all ordered year pairs,
    and the z against the textbook tie-free closed form."""
    [row] = _run(spark, "op-ext-jonckheere")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    by_year = {1995: [], 1996: [], 1997: []}
    for o in orders:
        if o.o_orderdate.year in by_year:
            by_year[o.o_orderdate.year].append(
                round(float(o.o_totalprice) * 100)
            )
    import bisect

    j2 = 0
    for yi, yj in ((1995, 1996), (1995, 1997), (1996, 1997)):
        a = sorted(by_year[yi])
        for x in by_year[yj]:
            lt = bisect.bisect_left(a, x)
            eq = bisect.bisect_right(a, x) - lt
            j2 += 2 * lt + eq
    ns = {yr: len(v) for yr, v in by_year.items()}
    n = sum(ns.values())
    assert (row.n_1995, row.n_1996, row.n_1997) == (
        ns[1995], ns[1996], ns[1997]
    )
    assert row.j2 == j2
    var = (
        n * n * (2 * n + 3)
        - sum(m * m * (2 * m + 3) for m in ns.values())
    ) / 72.0
    z_ref = (j2 / 2.0 - (n * n - sum(m * m for m in ns.values())) / 4.0
             ) / math.sqrt(var)
    assert math.isclose(row.z_score, z_ref, rel_tol=1e-9)


def test_page_trend_matches_rank_replay(spark):
    [row] = _run(spark, "op-ext-page-trend")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    per = {}
    years = {}
    for o in orders:
        yr = o.o_orderdate.year
        if yr in (1995, 1996, 1997):
            per.setdefault(o.o_custkey, {1995: 0, 1996: 0, 1997: 0})
            per[o.o_custkey][yr] += round(float(o.o_totalprice) * 100)
            years.setdefault(o.o_custkey, set()).add(yr)
    per = {
        c: v for c, v in per.items()
        if years[c] == {1995, 1996, 1997}
    }
    n = len(per)
    l2 = 0
    for v in per.values():
        vals = sorted(v.values())
        for j, yr in ((1, 1995), (2, 1996), (3, 1997)):
            lo = 1 + sum(1 for x in vals if x < v[yr])
            hi = sum(1 for x in vals if x <= v[yr])
            l2 += j * (lo + hi)
    assert row.n == n and row.l2 == l2
    z_ref = (l2 - 24 * n) / (2 * math.sqrt(2 * n))
    assert math.isclose(row.z_score, z_ref, rel_tol=1e-9)


def test_cochran_q_matches_table_replay(spark):
    [row] = _run(spark, "op-ext-cochran-q")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    act = {
        yr: {o.o_custkey for o in orders if o.o_orderdate.year == yr}
        for yr in (1995, 1996, 1997)
    }
    g = {yr: 0 for yr in act}
    sl = sl2 = 0
    for c in cust:
        flags = [int(c.c_custkey in act[yr]) for yr in (1995, 1996, 1997)]
        for yr, f_ in zip((1995, 1996, 1997), flags):
            g[yr] += f_
        li = sum(flags)
        sl += li
        sl2 += li * li
    assert (row.g95, row.g96, row.g97, row.sl, row.sl2) == (
        g[1995], g[1996], g[1997], sl, sl2
    )
    num = 2 * (3 * sum(x * x for x in g.values()) - sum(g.values()) ** 2)
    assert math.isclose(row.q_stat, num / (3 * sl - sl2), rel_tol=1e-12)


def test_anova_matches_numpy(spark):
    """One-way F replayed with literal numpy group sums — the textbook
    SSB/SSW/F decomposition, plus the identity check SSB + SSW = SST."""
    [row] = _run(spark, "op-ext-anova")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    assert set(groups) == {"A", "N", "R"}
    xs = [np.array(v) for v in groups.values()]
    n = sum(len(x) for x in xs)
    grand = sum(x.sum() for x in xs) / n
    ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in xs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
    f_ref = (ssb / 2) / (ssw / (n - 3))
    assert row.n_total == n
    assert row.df_between == 2 and row.df_within == n - 3
    assert math.isclose(row.ss_between, ssb, rel_tol=1e-9)
    assert math.isclose(row.ss_within, ssw, rel_tol=1e-9)
    assert math.isclose(row.f_stat, f_ref, rel_tol=1e-9)
    sst = sum(((x - grand) ** 2).sum() for x in xs)
    assert math.isclose(row.ss_between + row.ss_within, sst, rel_tol=1e-9)


def test_cramers_v_matches_replay(spark):
    """V replayed from a literal contingency table; bounded in [0, 1]
    and consistent with op-ext-chisq's statistic."""
    [row] = _run(spark, "op-ext-cramers-v")
    [chi] = _run(spark, "op-ext-chisq")
    assert row.chi2_x1e6 == chi.chi2_x1e6  # same floored-int machinery
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    from collections import Counter

    obs = Counter((r.c_mktsegment, r.c_nationkey) for r in cust)
    rt = Counter()
    ct = Counter()
    for (s, c), o in obs.items():
        rt[s] += o
        ct[c] += o
    n = sum(obs.values())
    chi2 = sum(
        (o - rt[s] * ct[c] / n) ** 2 / (rt[s] * ct[c] / n)
        for (s, c), o in obs.items()
    )
    minrc = min(len(rt) - 1, len(ct) - 1)
    v_ref = math.sqrt(chi2 / (n * minrc))
    # the engine floors per-cell contributions to 1e-6 before summing,
    # so compare at that granularity
    assert abs(row.cramers_v - v_ref) < 1e-3
    assert 0.0 <= row.cramers_v <= 1.0
    assert row.minrc == minrc and row.n_obs == n


def test_target_encode_loo_replay(spark):
    """Leave-one-out encoding replayed literally: every row's encoding
    equals the mean of the OTHER rows' targets in its category — and
    NEVER equals the plain category mean when that mean differs from
    the row's own value (the leakage the LOO form removes)."""
    rows = _run(spark, "op-ext-target-encode")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    cents = {
        r.o_orderkey: round(float(r.o_totalprice) * 100) for r in orders
    }
    by_prio = {}
    for r in orders:
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_orderkey)
    got = {r.o_orderkey: r.loo_mean_c for r in rows}
    assert len(got) == len(orders)
    for prio, keys in by_prio.items():
        s = sum(cents[k] for k in keys)
        n = len(keys)
        for k in keys:
            if n == 1:
                assert got[k] is None
            else:
                assert math.isclose(
                    got[k], (s - cents[k]) / (n - 1), rel_tol=1e-12
                )


def test_feature_hash_replay_and_shape(spark):
    """Hashing-trick buckets/signs replayed with hashlib.md5; bucket
    space bounded to 64 and total feature mass = 2 features per row."""
    import hashlib

    rows = _run(spark, "op-ext-feature-hash")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    feats = [f"seg={r.c_mktsegment}" for r in cust] + [
        f"nat={r.c_nationkey}" for r in cust
    ]
    alpha = "0123456789abcdef"
    ref_sum = {}
    ref_n = {}
    for f in feats:
        h = hashlib.md5(("fh:" + f).encode()).hexdigest()
        b = (alpha.index(h[0]) * 16 + alpha.index(h[1])) % 64
        s = 1 if alpha.index(h[2]) % 2 == 0 else -1
        ref_sum[b] = ref_sum.get(b, 0) + s
        ref_n[b] = ref_n.get(b, 0) + 1
    got = {r.bucket: (r.signed_sum, r.n_feats) for r in rows}
    assert got == {b: (ref_sum[b], ref_n[b]) for b in ref_n}
    assert all(0 <= b < 64 for b in got)
    assert sum(n for _, n in got.values()) == len(feats)


def test_brown_forsythe_matches_numpy(spark):
    """Median-centered Levene replayed literally (scipy's levene with
    center='median'): F on |x − med_g|, here on the 2x-scaled exact
    integers (F is scale-invariant)."""
    [row] = _run(spark, "op-ext-brown-forsythe")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    zs = []
    for v in groups.values():
        x = np.array(v)
        zs.append(np.abs(2 * x - 2 * np.median(x)))  # the op's 2x scale
    n = sum(len(z) for z in zs)
    grand = sum(z.sum() for z in zs) / n
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f_ref = (ssb / 2) / (ssw / (n - 3))
    assert row.n_total == n
    assert math.isclose(row.f_stat, f_ref, rel_tol=1e-9)
    # scale invariance: the UNscaled F matches too
    zs1 = [z / 2.0 for z in zs]
    grand1 = sum(z.sum() for z in zs1) / n
    ssb1 = sum(len(z) * (z.mean() - grand1) ** 2 for z in zs1)
    ssw1 = sum(((z - z.mean()) ** 2).sum() for z in zs1)
    assert math.isclose(row.f_stat, (ssb1 / 2) / (ssw1 / (n - 3)), rel_tol=1e-9)


def test_paired_ttest_matches_numpy(spark):
    """Paired t replayed literally on the same customer-year pairing
    ($100-truncated diffs, zeros kept — unlike Wilcoxon)."""
    [row] = _run(spark, "op-ext-paired-ttest")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    per = {}
    for r in orders:
        y = r.o_orderdate.year
        if y in (1995, 1996):
            c = per.setdefault(r.o_custkey, [0, 0, 0, 0])
            cents = round(float(r.o_totalprice) * 100)
            if y == 1995:
                c[0] += cents
                c[2] += 1
            else:
                c[1] += cents
                c[3] += 1
    ds = [
        (c96 - c95) // 10000  # trunc toward zero, like div/'//'
        if (c96 - c95) >= 0
        else -((c95 - c96) // 10000)
        for c95, c96, n95, n96 in per.values()
        if n95 > 0 and n96 > 0
    ]
    d = np.array(ds, dtype=np.float64)
    assert row.n_pairs == len(d) and row.df == len(d) - 1
    t_ref = d.mean() / math.sqrt(d.var(ddof=1) / len(d))
    assert math.isclose(row.mean_d, d.mean(), rel_tol=1e-12)
    assert math.isclose(row.t_stat, t_ref, rel_tol=1e-9)


def test_mann_kendall_matches_bruteforce(spark):
    """Replay S, the tie-corrected Var[S], and the continuity-corrected
    z per nation with a literal all-pairs pass over the same monthly
    exact-cents series (scipy-free)."""
    from collections import defaultdict
    from decimal import Decimal

    rows = _run(spark, "op-ext-mann-kendall")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    nk = {r.c_custkey: r.c_nationkey for r in c}
    per = defaultdict(int)
    for r in o:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        cents = int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
        )
        per[(nk[r.o_custkey], m)] += cents
    series = defaultdict(list)
    for (n_, m), v in per.items():
        series[n_].append((m, v))
    got = {r.nationkey: r for r in rows}
    assert set(got) == set(series)
    for nat, sv in series.items():
        sv.sort()
        n = len(sv)
        s = sum(
            (1 if sv[j][1] > sv[i][1] else -1 if sv[j][1] < sv[i][1] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        tiecounts = defaultdict(int)
        for _, v in sv:
            tiecounts[v] += 1
        tie18 = sum(
            t * (t - 1) * (2 * t + 5) for t in tiecounts.values() if t > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        row = got[nat]
        assert row.n_months == n and row.s_stat == s
        assert math.isclose(row.var_s, var18 / 18.0, rel_tol=1e-12)
        if s == 0 or var18 <= 0:
            z_ref = 0.0
        else:
            z_ref = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
        assert math.isclose(row.z_mk, z_ref, rel_tol=1e-12)


def test_theil_sen_matches_numpy(spark):
    """Median-of-pairwise-slopes replay: numpy's even-count median is
    the same middle-two average the op's positional pick computes."""
    from collections import defaultdict
    from decimal import Decimal

    rows = _run(spark, "op-ext-theil-sen")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    nk = {r.c_custkey: r.c_nationkey for r in c}
    per = defaultdict(int)
    for r in o:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        cents = int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
        )
        per[(nk[r.o_custkey], m)] += cents
    series = defaultdict(list)
    for (n_, m), v in per.items():
        series[n_].append((m, v))
    got = {r.nationkey: r for r in rows}
    assert set(got) == set(series)
    for nat, sv in series.items():
        sv.sort()
        slopes = [
            (sv[j][1] - sv[i][1]) / (sv[j][0] - sv[i][0])
            for i in range(len(sv))
            for j in range(i + 1, len(sv))
        ]
        row = got[nat]
        assert row.n_pairs == len(slopes)
        assert math.isclose(
            row.ts_slope, float(np.median(slopes)), rel_tol=1e-12
        )


def _norm_tail_poly(z: float) -> float:
    """The A&S 26.2.17 five-term upper tail — transcribed from the
    registry's _NORM_TAIL so the test checks the RANK/SERIES algebra,
    not polynomial accuracy."""
    k = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = k * (
        0.319381530
        + k
        * (
            -0.356563782
            + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429))
        )
    )
    return math.exp(-0.5 * z * z) / 2.5066282746310002 * poly


def test_anderson_darling_matches_rowwise(spark):
    """Replay A² with the textbook PER-ROW (2i−1) sum over the sorted
    sample — the op computes the same sum collapsed to the
    distinct-value frame via arithmetic series; agreement proves the
    tied-rank algebra. Tolerance covers the op's per-term 1e-6
    fixed-point quantization (≤ distinct_terms·1e-6/n absolute)."""
    from collections import defaultdict
    from decimal import Decimal

    rows = _run(spark, "op-ext-anderson-darling")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    groups = defaultdict(list)
    for r in ev:
        if r.value is not None:
            groups[r.event_type].append(
                int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
            )
    got = {r.event_type: r for r in rows}
    assert set(got) == set(groups)
    for g, xs in groups.items():
        xs.sort()
        n = len(xs)
        mu = sum(xs) / n
        # exact sample std from integer power sums, as the op does
        sd = math.sqrt(
            (n * sum(x * x for x in xs) - sum(xs) * sum(xs))
            / (n * (n - 1))
        )
        total = 0.0
        for i, x in enumerate(xs, start=1):
            z_lo = (xs[i - 1] - mu) / sd
            z_hi = (xs[n - i] - mu) / sd
            phi_lo = (
                1.0 - _norm_tail_poly(z_lo)
                if z_lo >= 0
                else _norm_tail_poly(z_lo)
            )
            phi_hi = (
                1.0 - _norm_tail_poly(z_hi)
                if z_hi >= 0
                else _norm_tail_poly(z_hi)
            )
            phi_lo = min(max(phi_lo, 1e-300), 1.0 - 1e-16)
            q_hi = min(max(1.0 - phi_hi, 1e-300), 1.0 - 1e-16)
            total += (2 * i - 1) * (math.log(phi_lo) + math.log(q_hi))
        a2_ref = -n - total / n
        row = got[g]
        assert row.n_rows == n
        assert math.isclose(row.a2, a2_ref, rel_tol=1e-6, abs_tol=1e-5)
        assert math.isclose(
            row.a2_mod,
            a2_ref * (1.0 + 0.75 / n + 2.25 / (n * n)),
            rel_tol=1e-6,
            abs_tol=1e-5,
        )


def test_kendall_tau_matches_bruteforce(spark):
    """Replay concordant/discordant counts, both tie corrections, and
    tau-b per nation with a literal all-pairs pass over the same
    (revenue-cents, order-count) monthly series (scipy-free)."""
    from collections import defaultdict
    from decimal import Decimal

    rows = _run(spark, "op-ext-kendall-tau")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    nk = {r.c_custkey: r.c_nationkey for r in c}
    per = defaultdict(lambda: [0, 0])
    for r in o:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        cents = int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
        )
        cell = per[(nk[r.o_custkey], m)]
        cell[0] += cents
        cell[1] += 1
    series = defaultdict(list)
    for (n_, m), (v, q) in per.items():
        series[n_].append((m, v, q))
    got = {r.nationkey: r for r in rows}
    assert set(got) == set(series)
    for nat, sv in series.items():
        sv.sort()
        n = len(sv)
        nc = nd = 0
        for i in range(n):
            for j in range(i + 1, n):
                d = (sv[j][1] - sv[i][1]) * (sv[j][2] - sv[i][2])
                if d > 0:
                    nc += 1
                elif d < 0:
                    nd += 1
        tiev = defaultdict(int)
        tieq = defaultdict(int)
        for _, v, q in sv:
            tiev[v] += 1
            tieq[q] += 1
        tv = sum(t * (t - 1) // 2 for t in tiev.values() if t > 1)
        tq = sum(t * (t - 1) // 2 for t in tieq.values() if t > 1)
        n0 = n * (n - 1) // 2
        row = got[nat]
        assert row.n_months == n and row.n_conc == nc and row.n_disc == nd
        if n0 - tv <= 0 or n0 - tq <= 0:
            tau_ref = 0.0
        else:
            tau_ref = (nc - nd) / math.sqrt((n0 - tv) * (n0 - tq))
        assert math.isclose(row.tau_b, tau_ref, rel_tol=1e-12)


def test_kendall_tau_bounds_and_shared_frame(spark):
    """Structural pins: |tau_b| ≤ 1, nc + nd never exceeds the
    tie-free pair count, and the monthly frame is the same one
    op-ext-mann-kendall aggregates (same nations, same month counts —
    both ops must see one series, not two drifting copies)."""
    mk = {r.nationkey: r for r in _run(spark, "op-ext-mann-kendall")}
    kt = {r.nationkey: r for r in _run(spark, "op-ext-kendall-tau")}
    assert set(mk) == set(kt)
    for nat, row in kt.items():
        assert mk[nat].n_months == row.n_months
        n0 = row.n_months * (row.n_months - 1) // 2
        assert 0 <= row.n_conc + row.n_disc <= n0
        assert -1.0 <= row.tau_b <= 1.0


def test_psi_matches_pure_python(spark):
    """Replay the integer binning, add-one smoothing, and the
    nano-quantized PSI terms from the raw orders (scipy-free)."""
    [row] = _run(spark, "op-ext-psi")
    from decimal import Decimal

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    cents = lambda r: int(
        Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
    )
    base = [cents(r) for r in o if r.o_orderdate.year == 1995]
    targ = [cents(r) for r in o if r.o_orderdate.year == 1996]
    mn, mx = min(base), max(base)
    binf = lambda c: min(9, ((min(mx, max(mn, c)) - mn) * 10) // (mx - mn + 1))
    ca = [1] * 10
    cb = [1] * 10
    for c in base:
        ca[binf(c)] += 1
    for c in targ:
        cb[binf(c)] += 1
    nap, nbp = sum(ca), sum(cb)
    psi_nano = sum(
        math.floor(
            1e9
            * ((ca[b] * nbp - cb[b] * nap) / (nap * nbp))
            * math.log((ca[b] * nbp) / (cb[b] * nap))
        )
        for b in range(10)
    )
    assert row.n_base == len(base) and row.n_target == len(targ)
    assert row.n_bins == 10
    assert row.psi_nano == psi_nano
    assert math.isclose(row.psi, psi_nano / 1e9, rel_tol=1e-12)


def test_cliffs_delta_matches_bruteforce(spark):
    """Replay gt/lt pair counts with a literal loop over the two
    value-count maps; pin |delta| <= 1 and the Mann-Whitney link
    (gt + lt + ties = n_a * n_b)."""
    [row] = _run(spark, "op-ext-cliffs-delta")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    from collections import Counter

    a = Counter(int(r.l_quantity) for r in li if r.l_returnflag == "A")
    b = Counter(int(r.l_quantity) for r in li if r.l_returnflag == "R")
    gt = sum(ca * cb for va, ca in a.items() for vb, cb in b.items() if va > vb)
    lt = sum(ca * cb for va, ca in a.items() for vb, cb in b.items() if va < vb)
    n_a, n_b = sum(a.values()), sum(b.values())
    assert (row.n_a, row.n_b, row.n_gt, row.n_lt) == (n_a, n_b, gt, lt)
    assert math.isclose(row.cliffs_delta, (gt - lt) / (n_a * n_b), rel_tol=1e-12)
    assert -1.0 <= row.cliffs_delta <= 1.0
    ties = sum(ca * b[va] for va, ca in a.items())
    assert gt + lt + ties == n_a * n_b
