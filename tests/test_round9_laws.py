"""Property laws for the round-9 operator classes (X287-X295): each
query's oracle pins exact values; these pin the ALGEBRA the values
must satisfy via independent pure-Python replays, so a future rewrite
can't drift into plausibly-wrong output."""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def _half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _round_even(x: float) -> int:
    # Spark/DuckDB ROUND on DOUBLE is IEEE round-half-even at exact .5
    # only for values the binary double actually represents as .5;
    # replays evaluate the SAME double expression, so Python round()
    # (banker's) matches both engines.
    return round(x)


# ---------------------------------------------------------------- X287
def test_runs_test_replay(spark, sf_dir):
    daily = duckdb.sql(
        f"""SELECT o_orderdate,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS rev
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
            ORDER BY 1""").fetchall()
    revs = sorted(r for _, r in daily)
    nd = len(revs)
    med2 = revs[(nd + 1) // 2 - 1] + revs[(nd + 2) // 2 - 1]
    signs = [(d, 1 if 2 * r > med2 else 0)
             for d, r in daily if 2 * r != med2]
    signs.sort()
    n = len(signs)
    n1 = sum(s for _, s in signs)
    n2 = n - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:])
                   if a[1] != b[1])
    e_micro = 1000000 + _round_even(2 * n1 * n2 * 1000000 / n)
    var_nano = _round_even(
        2 * n1 * n2 * (2 * n1 * n2 - n) * 1000000000
        / (n * n * (n - 1)))
    z_micro = _round_even((runs * 1000000 - e_micro)
                          / math.sqrt(var_nano / 1000000000.0))
    (row,) = _rows("runs_test_daily_revenue", spark, sf_dir)
    assert (row.n_days, row.n_above, row.n_below, row.runs) == \
        (n, n1, n2, runs)
    assert (row.e_micro, row.var_nano, row.z_micro) == \
        (e_micro, var_nano, z_micro)
    assert 1 <= row.runs <= row.n_days


# ---------------------------------------------------------------- X288
def test_iv_wald_replay_and_ratio_consistency(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import IV_FAST_DAYS

    cells = duckdb.sql(
        f"""SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT',
                        '2-HIGH') THEN 1 ELSE 0 END,
                   CASE WHEN date_diff('day', o.o_orderdate,
                        l.l_shipdate) <= {IV_FAST_DAYS}
                        THEN 1 ELSE 0 END,
                   CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o
              ON o.o_orderkey = l.l_orderkey""").fetchall()
    n1 = sum(z for z, _, _ in cells)
    n0 = len(cells) - n1
    sy1 = sum(y for z, _, y in cells if z)
    sy0 = sum(y for z, _, y in cells if not z)
    sx1 = sum(x for z, x, _ in cells if z)
    sx0 = sum(x for z, x, _ in cells if not z)
    (row,) = _rows("iv_wald_estimate", spark, sf_dir)
    assert (row.n1, row.n0, row.sy1, row.sy0, row.sx1, row.sx0) == \
        (n1, n0, sy1, sy0, sx1, sx0)
    assert row.itt_y_micro == _round_even(
        (sy1 * n0 - sy0 * n1) * 1000000 / (n1 * n0))
    assert row.wald_micro == _round_even(
        (sy1 * n0 - sy0 * n1) * 1000000 / (sx1 * n0 - sx0 * n1))
    # ratio consistency on exact rationals: wald == itt / fs
    itt = Fraction(sy1, n1) - Fraction(sy0, n0)
    fs = Fraction(sx1, n1) - Fraction(sx0, n0)
    assert abs(row.wald_micro - float(itt / fs) * 1e6) <= 1


# ---------------------------------------------------------------- X289
def test_cochran_q_replay_and_mcnemar_reduction(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import (CQ_DISC_MILLI,
                                                      CQ_PRICE_CENTS,
                                                      CQ_QTY)

    scored = duckdb.sql(
        f"""SELECT CASE WHEN (CAST(FLOOR(l_extendedprice * 100 + 0.5)
                         AS BIGINT) >= {CQ_PRICE_CENTS})
                        = (l_returnflag = 'R') THEN 1 ELSE 0 END,
                   CASE WHEN (l_quantity >= {CQ_QTY})
                        = (l_returnflag = 'R') THEN 1 ELSE 0 END,
                   CASE WHEN (CAST(FLOOR(l_discount * 1000 + 0.5)
                         AS BIGINT) >= {CQ_DISC_MILLI})
                        = (l_returnflag = 'R') THEN 1 ELSE 0 END
            FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    g = [sum(r[j] for r in scored) for j in range(3)]
    t = sum(g)
    l2 = sum(sum(r) * sum(r) for r in scored)
    (row,) = _rows("cochran_q_rules", spark, sf_dir)
    assert (row.g1, row.g2, row.g3, row.t_total, row.sum_l_sq) == \
        (g[0], g[1], g[2], t, l2)
    den = 3 * t - l2
    q = Fraction(2 * (3 * sum(x * x for x in g) - t * t), den)
    assert row.q_micro == _round_even(
        (2 * (sum(x * x for x in g)) * 3 - 2 * t * t) * 1000000 / den)
    assert q >= 0 and row.q_micro >= 0
    # k=2 reduction: Cochran's Q over two rules equals McNemar's
    # uncorrected chi2 (b-c)^2/(b+c) — checked on exact rationals.
    b = sum(1 for r in scored if r[0] and not r[1])
    c = sum(1 for r in scored if r[1] and not r[0])
    g2_ = [g[0], g[1]]
    t2 = sum(g2_)
    l22 = sum((r[0] + r[1]) ** 2 for r in scored)
    q2 = Fraction(1 * (2 * sum(x * x for x in g2_) - t2 * t2),
                  2 * t2 - l22)
    assert q2 == Fraction((b - c) ** 2, b + c)


# ---------------------------------------------------------------- X290
def test_littles_law_replay_and_identity(spark, sf_dir):
    jobs = duckdb.sql(
        f"""SELECT o.o_orderdate, MAX(l.l_shipdate)
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/lineitem.parquet' l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate""").fetchall()
    import datetime as dt

    def month_start(d):
        return d.date().replace(day=1) if hasattr(d, "date") else \
            d.replace(day=1)

    def next_month(m):
        return (m.replace(day=28) + dt.timedelta(days=4)).replace(day=1)

    jobs = [(a.date() if isinstance(a, dt.datetime) else a,
             b.date() if isinstance(b, dt.datetime) else b)
            for a, b in jobs]
    lo = month_start(min(d0 for d0, _ in jobs))
    hi = month_start(max(d1 for _, d1 in jobs))
    rows = {r.month: r for r in _rows("littles_law_flow_audit",
                                      spark, sf_dir)}
    m = lo
    checked = 0
    while m <= hi:
        nm = next_month(m)
        d = (nm - m).days
        arr = [(d0, d1) for d0, d1 in jobs if m <= d0 < nm]
        a = len(arr)
        wsum = sum((d1 - d0).days + 1 for d0, d1 in arr)
        ov = sum(max(0, (min(d1, nm - dt.timedelta(days=1))
                         - max(d0, m)).days + 1)
                 for d0, d1 in jobs if d0 < nm and d1 >= m)
        r = rows[m]
        assert r.days == d and r.arrivals == a
        assert r.lam_micro == _round_even(a * 1000000 / d)
        if a:
            assert r.w_micro == _round_even(wsum * 1000000 / a)
        assert r.l_micro == _round_even(ov * 1000000 / d)
        assert r.lw_micro == _round_even(wsum * 1000000 / d)
        # identity: residual is exactly l - lw on the snapped grid
        assert r.resid_micro == r.l_micro - r.lw_micro
        checked += 1
        m = nm
    assert checked == len(rows) >= 12


# ---------------------------------------------------------------- X291
def test_gumbel_replay_and_monotonicity(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import (
        GUM_C10_MICRO, GUM_C100_MICRO, GUM_GAMMA_MICRO,
        GUM_SQRT6_PI_MICRO)

    blocks = duckdb.sql(
        f"""SELECT date_trunc('week', o_orderdate),
                   MAX(CAST(FLOOR(o_totalprice * 100 + 0.5)
                       AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1""").fetchall()
    ms = [m for _, m in blocks]
    b = len(ms)
    mean_micro = _round_even(sum(ms) * 1000000 / b)
    ssq = sum((m * 1000000 - mean_micro) ** 2 for m in ms)
    scale_micro = _round_even(
        GUM_SQRT6_PI_MICRO * math.sqrt(ssq / (b - 1)) / 1000000)
    loc_micro = mean_micro - \
        (scale_micro * GUM_GAMMA_MICRO + 500000) // 1000000
    rl10 = loc_micro + (scale_micro * GUM_C10_MICRO + 500000) // 1000000
    rl100 = loc_micro + \
        (scale_micro * GUM_C100_MICRO + 500000) // 1000000
    (row,) = _rows("gumbel_weekly_maxima", spark, sf_dir)
    assert (row.n_blocks, row.mean_micro, row.scale_micro) == \
        (b, mean_micro, scale_micro)
    assert (row.loc_micro, row.rl10_micro, row.rl100_micro) == \
        (loc_micro, rl10, rl100)
    assert row.scale_micro > 0
    assert row.rl100_micro > row.rl10_micro > row.loc_micro


# ---------------------------------------------------------------- X292
def test_logrank_replay_and_conservation(spark, sf_dir):
    ev = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM '{sf_dir}/events.parquet'""").fetchall()
    t0, tp = {}, {}
    w_us = max(us for _, _, us in ev)
    for u, t, us in ev:
        t0[u] = min(t0.get(u, us), us)
        if t == "purchase":
            tp[u] = min(tp.get(u, us), us)
    subj = [(u % 2, (tp.get(u, w_us) - t0[u]) // 1000000,
             1 if u in tp else 0) for u in t0]
    times = sorted({d for _, d, e in subj if e})
    o1 = sum(1 for g, _, e in subj if e and g == 1)
    o0 = sum(1 for g, _, e in subj if e and g == 0)
    e1_nano = v_nano = 0
    for t in times:
        n1 = sum(1 for g, d, _ in subj if g == 1 and d >= t)
        n0 = sum(1 for g, d, _ in subj if g == 0 and d >= t)
        d1 = sum(1 for g, d, e in subj if g == 1 and e and d == t)
        d0 = sum(1 for g, d, e in subj if g == 0 and e and d == t)
        d_, n_ = d1 + d0, n1 + n0
        e1_nano += _round_even(d_ * n1 * 1e9 / n_)
        if n_ > 1:
            v_nano += _round_even(
                d_ * n1 * n0 * (n_ - d_) * 1e9 / (n_ * n_ * (n_ - 1)))
    chi2_micro = _round_even(
        (o1 * 10**9 - e1_nano) ** 2 / (v_nano * 1000.0))
    (row,) = _rows("logrank_purchase_groups", spark, sf_dir)
    assert (row.o1, row.o0) == (o1, o0)
    assert (row.e1_nano, row.v_nano, row.chi2_micro) == \
        (e1_nano, v_nano, chi2_micro)
    # conservation: every subject with an event is observed in a group
    assert row.o1 + row.o0 == sum(e for _, _, e in subj)
    assert row.n1_users + row.n0_users == len(subj)


# ---------------------------------------------------------------- X293
def test_jonckheere_replay(spark, sf_dir):
    vals = duckdb.sql(
        f"""SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT),
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/orders.parquet'""").fetchall()
    groups: dict[int, list[int]] = {}
    for g, v in vals:
        groups.setdefault(g, []).append(v)
    import bisect

    for g in groups:
        groups[g].sort()
    keys = sorted(groups)
    j2 = 0
    for i_, gi in enumerate(keys):
        for gj in keys[i_ + 1:]:
            a = groups[gi]
            for x in groups[gj]:
                lt = bisect.bisect_left(a, x)
                eq = bisect.bisect_right(a, x) - lt
                j2 += 2 * lt + eq
    n = len(vals)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    e_j2 = (n * n - sn2) // 2
    # tie-corrected variance (SAS PROC FREQ)
    from collections import Counter

    tc = Counter(v for _, v in vals)
    ns = [len(v) for v in groups.values()]
    a_ = (n * (n - 1) * (2 * n + 5)
          - sum(x * (x - 1) * (2 * x + 5) for x in ns)
          - sum(t * (t - 1) * (2 * t + 5) for t in tc.values()))
    var = (a_ / 72
           + (sum(x * (x - 1) * (x - 2) for x in ns)
              / (6.0 * n * (n - 1.0)))
           * (sum(t * (t - 1) * (t - 2) for t in tc.values())
              / (6.0 * (n - 2.0)))
           + (sum(x * (x - 1) for x in ns) / (4.0 * n))
           * (sum(t * (t - 1) for t in tc.values())
              / (2.0 * (n - 1.0))))
    (row,) = _rows("jonckheere_priority_trend", spark, sf_dir)
    assert (row.n_total, row.j2, row.e_j2) == (n, j2, e_j2)
    assert math.isclose(row.var_j, var, rel_tol=1e-12)
    assert row.z_micro == _round_even(
        (j2 - e_j2) * 1000000 / (2 * math.sqrt(row.var_j)))
    # pair-count conservation: with no between-group comparisons
    # missed, J2 maxes at 2 * sum_{i<j} n_i n_j
    assert 0 <= j2 <= 2 * e_j2 * 2


# ---------------------------------------------------------------- X294
def _dgim_greedy(bits_newest_first):
    """Step-by-step DGIM merge over (hid, bit) oldest->newest; returns
    bucket list newest->oldest as (size, end_hid)."""
    buckets: list[list] = []  # newest first: [size, end_hid]
    for hid, bit in sorted(bits_newest_first):
        if not bit:
            continue
        buckets.insert(0, [1, hid])
        size = 1
        while True:
            same = [b for b in buckets if b[0] == size]
            if len(same) < 3:
                break
            oldest_two = same[-2:]
            merged = [2 * size, oldest_two[0][1]]
            idx = buckets.index(oldest_two[0])
            buckets = [b for b in buckets if b not in oldest_two]
            buckets.insert(idx, merged)
            size *= 2
    return [(b[0], b[1]) for b in buckets]


def test_dgim_matches_merge_simulation_and_error_bound(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.sketches import \
        DGIM_WINDOW_HOURS

    hrs = duckdb.sql(
        f"""SELECT epoch_us(ts) // 3600000000 AS hid,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END) AS bit
            FROM '{sf_dir}/events.parquet' GROUP BY 1""").fetchall()
    t_now = max(h for h, _ in hrs)
    sim = _dgim_greedy(hrs)
    rows = _rows("dgim_purchase_hours", spark, sf_dir)
    got_buckets = sorted(
        ((r.size, r.end_hid) for r in rows if r.kind == "bucket"),
        key=lambda t: -t[1])
    # closed-form bucket structure == step-by-step merge state
    assert got_buckets == sim
    summary = {r.kind: r.value for r in rows if r.kind != "bucket"}
    exact2 = 2 * sum(b for h, b in hrs
                     if h > t_now - DGIM_WINDOW_HOURS)
    assert summary["exact2"] == exact2
    assert summary["total_ones"] == sum(b for _, b in hrs)
    # DGIM guarantee: estimate within 50% of truth
    assert abs(summary["est2"] - exact2) <= exact2 // 2 + 1


# ---------------------------------------------------------------- X295
def test_hdbscan_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import (HDB_CUTS,
                                                      HDB_EPS2, HDB_K,
                                                      HDB_Y_DIV)

    pts = duckdb.sql(
        f"""SELECT o_custkey, COUNT(*),
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) // {HDB_Y_DIV}
            FROM '{sf_dir}/orders.parquet' GROUP BY 1""").fetchall()
    P = {i: (x, y) for i, x, y in pts}
    ids = sorted(P)
    nbrs = {i: sorted(
        ((P[i][0] - P[j][0]) ** 2 + (P[i][1] - P[j][1]) ** 2)
        for j in ids if j != i
        and (P[i][0] - P[j][0]) ** 2 + (P[i][1] - P[j][1]) ** 2
        <= HDB_EPS2) for i in ids}
    cd = {i: d[HDB_K - 1] for i, d in nbrs.items()
          if len(d) >= HDB_K}
    core = sorted(cd)

    def uf_profile(cut):
        parent = {i: i for i in core}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a_i, a in enumerate(core):
            for b in core[a_i + 1:]:
                d2 = (P[a][0] - P[b][0]) ** 2 + (P[a][1] - P[b][1]) ** 2
                if d2 <= HDB_EPS2 and max(cd[a], cd[b], d2) <= cut:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[ra] = rb
        from collections import Counter

        sizes = Counter(find(i) for i in core)
        big = [c for c in sizes.values() if c >= 2]
        return (len(big), sum(big),
                sum(1 for c in sizes.values() if c == 1),
                max(sizes.values()) if sizes else 0)

    rows = {r.cut2: r for r in _rows("hdbscan_mutual_reachability",
                                     spark, sf_dir)}
    for cut in HDB_CUTS:
        want = uf_profile(cut)
        r = rows[cut]
        assert (r.n_clusters, r.clustered_pts, r.singleton_pts,
                r.largest) == want, f"cut {cut}"
    assert rows[-1].n_clusters == len(ids) - len(core)  # noise count
    # monotone laws: clustered mass and largest cluster grow with cut
    cl = [rows[c].clustered_pts for c in HDB_CUTS]
    lg = [rows[c].largest for c in HDB_CUTS]
    assert cl == sorted(cl) and lg == sorted(lg)
