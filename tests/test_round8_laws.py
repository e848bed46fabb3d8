"""Property laws for the round-8 operator classes (X278-X286): each
query's oracle pins exact values; these pin the ALGEBRA the values
must satisfy via independent pure-Python replays, so a future rewrite
can't drift into plausibly-wrong output."""

from __future__ import annotations

import math

import duckdb

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def _half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _fdiv(a: int, d: int) -> int:
    return (a - ((a % d) + d) % d) // d


def _daily_counts(sf_dir):
    return duckdb.sql(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()


# ---------------------------------------------------------------- X278
def test_holt_damped_replay_and_decay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import HD_HORIZON

    daily = _daily_counts(sf_dir)
    xs = [n * 1_000_000 for _, n in daily]
    l, b = xs[0], 0
    fit = []
    for t in range(1, len(xs)):
        x = xs[t]
        phib = _fdiv(3 * b, 4)
        err = x - (l + phib)
        l_new = _fdiv(x + l + phib, 2)
        b_new = _fdiv(l_new - l + 3 * phib, 4)
        fit.append(("fit", daily[t][0], x // 1_000_000,
                    l_new, b_new, err))
        l, b = l_new, b_new
    fc, inc, f = [], b, l
    for h in range(1, HD_HORIZON + 1):
        inc = _fdiv(3 * inc, 4)
        f = f + inc
        fc.append(("forecast", daily[-1][0] + __import__(
            "datetime").timedelta(days=h), h, f, inc, None))
    got = sorted((r["kind"], r["day"], r["n"], r["level_micro"],
                  r["trend_micro"], r["err_micro"])
                 for r in _rows("holt_damped_daily", spark, sf_dir))
    assert got == sorted(fit + fc)
    # damping: forecast increments decay in magnitude
    incs = [r[4] for r in sorted(fc, key=lambda r: r[2])]
    assert all(abs(b) >= abs(a) for b, a in zip(incs, incs[1:]))


# ---------------------------------------------------------------- X279
def test_prefixspan_replay_and_antimonotone(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import \
        PS_MINSUP_PCT

    ev = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM '{sf_dir}/events.parquet'
            ORDER BY user_id, 3""").fetchall()
    seq: dict = {}
    for u, t, us in ev:
        seq.setdefault(u, []).append((us, t))
    nu = len(seq)
    minsup = (nu * PS_MINSUP_PCT) // 100 + 1

    def supp(pat):
        n = 0
        for s in seq.values():
            i = 0
            ok = True
            last = -1
            for sym in pat:
                nxt = None
                for us, t in s:
                    if t == sym and us > last:
                        nxt = us
                        break
                if nxt is None:
                    ok = False
                    break
                last = nxt
            n += ok
        return n

    types = sorted({t for s in seq.values() for _, t in s})
    expect = {}
    l1 = [a for a in types if supp((a,)) >= minsup]
    for a in l1:
        expect[a] = (1, supp((a,)))
    l2 = []
    for a in l1:
        for b in l1:
            sp = supp((a, b))
            if sp >= minsup:
                expect[f"{a}->{b}"] = (2, sp)
                l2.append((a, b))
    for a, b in l2:
        for c in l1:
            sp = supp((a, b, c))
            if sp >= minsup:
                expect[f"{a}->{b}->{c}"] = (3, sp)
    got = {r["pattern"]: (r["length"], r["support"])
           for r in _rows("prefixspan_top_patterns", spark, sf_dir)}
    assert got == expect
    # anti-monotonicity: every frequent k-pattern's prefix is frequent
    # with support >= the extension's
    for pat, (ln, sp) in got.items():
        if ln > 1:
            pre = "->".join(pat.split("->")[:-1])
            assert pre in got and got[pre][1] >= sp


# ---------------------------------------------------------------- X280
def test_friedman_replay_and_rank_identity(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.relational import FRIEDMAN_K

    cells = duckdb.sql(f"""
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
               o_orderpriority,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2""").fetchall()
    blocks: dict = {}
    for wk, pri, y in cells:
        blocks.setdefault(wk, {})[pri] = int(y)
    blocks = {wk: d for wk, d in blocks.items()
              if len(d) == FRIEDMAN_K}
    n, k = len(blocks), FRIEDMAN_K
    rd: dict = {}
    t_sum = 0
    for d in blocks.values():
        ys = list(d.values())
        for pri, y in d.items():
            s = sum(1 for v in ys if v < y)
            e = sum(1 for v in ys if v == y)
            rd[pri] = rd.get(pri, 0) + 2 * s + e + 1
        for y in set(ys):
            e = ys.count(y)
            t_sum += e ** 3 - e
    assert sum(rd.values()) == n * k * (k + 1)  # rank-sum identity
    sq = sum(v * v for v in rd.values())
    d1 = n * k * (k + 1)
    d2 = n * k * (k * k - 1)
    n1 = 3 * sq - 3 * n * n * k * (k + 1) * (k + 1)
    chi2 = _half_away(n1 * 1_000_000 / d1)
    chi2t = _half_away(float(n1 * d2 * 1_000_000) / (d1 * (d2 - t_sum)))
    for r in _rows("friedman_priority_weeks", spark, sf_dir):
        assert r["n_blocks"] == n
        assert r["rd_sum"] == rd[r["priority"]]
        assert r["chi2_micro"] == chi2
        assert r["tie_sum"] == t_sum
        assert r["chi2_tie_micro"] == chi2t


# ---------------------------------------------------------------- X281
def test_token_bucket_replay_and_conservation(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import (
        TB_CAP, TB_REFILL)

    rows = duckdb.sql(f"""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE), COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2""").fetchall()
    d0 = min(r[1] for r in rows)
    nd = (max(r[1] for r in rows) - d0).days + 1
    arr: dict = {}
    for u, d, a in rows:
        arr.setdefault(u, {})[(d - d0).days + 1] = int(a)
    got = {r["user_id"]: r
           for r in _rows("token_bucket_rate_audit", spark, sf_dir)}
    assert set(got) == set(arr)
    for u, m in arr.items():
        tokens, adm, rej, thr, mxr = TB_CAP, 0, 0, 0, 0
        for d in range(1, nd + 1):
            a = m.get(d, 0)
            av = min(TB_CAP, tokens + TB_REFILL)
            ad = min(a, av)
            tokens = av - ad
            adm += ad
            rej += a - ad
            thr += (a - ad) > 0
            mxr = max(mxr, a - ad)
        r = got[u]
        assert (r["admitted"], r["rejected"], r["throttled_days"],
                r["max_day_rejected"], r["end_tokens"]) == \
            (adm, rej, thr, mxr, tokens)
        assert r["admitted"] + r["rejected"] == sum(m.values())
        assert 0 <= r["end_tokens"] <= TB_CAP


# ---------------------------------------------------------------- X282
def test_butterfly_replay_and_double_count(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    from etl_airflow_spotify_spark.queries.graph import BFLY_TOPK

    op = duckdb.sql(f"""
        SELECT DISTINCT l_orderkey, l_partkey
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    basket: dict = {}
    for g, i in op:
        basket.setdefault(g, []).append(i)
    s: Counter = Counter()
    for parts in basket.values():
        for p, q in combinations(sorted(parts), 2):
            s[(p, q)] += 1
    bf_total = sum(v * (v - 1) // 2 for v in s.values())
    per_part: Counter = Counter()
    for (p, q), v in s.items():
        per_part[p] += v * (v - 1) // 2
        per_part[q] += v * (v - 1) // 2
    assert sum(per_part.values()) == 2 * bf_total  # double count
    deg_p: Counter = Counter(i for _, i in op)
    cat = sum((len(basket[g]) - 1) * (deg_p[i] - 1) for g, i in op)
    got = {(r["kind"], r["partkey"]): r["value"]
           for r in _rows("butterfly_copurchase_census", spark, sf_dir)}
    assert got[("butterflies", -1)] == bf_total
    assert got[("caterpillars", -1)] == cat
    if cat:
        assert got[("bcc_micro", -1)] == _half_away(
            float(4 * bf_total * 1_000_000) / cat)
    top = sorted(per_part.items(), key=lambda t: (-t[1], t[0]))
    top = top[:BFLY_TOPK]
    assert {(p, v) for p, v in top} == {
        (pk, v) for (kind, pk), v in got.items() if kind == "part"}


# ---------------------------------------------------------------- X283
def test_ks_replay_and_bounds(spark, sf_dir):
    vals = duckdb.sql(f"""
        SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT),
               l_returnflag
        FROM '{sf_dir}/lineitem.parquet'
        WHERE l_returnflag IN ('R', 'N')""").fetchall()
    a = sorted(v for v, f in vals if f == "R")
    b = sorted(v for v, f in vals if f == "N")
    n1, n2 = len(a), len(b)
    import bisect
    best, arg = -1, None
    for v in sorted(set(a) | set(b)):
        c1 = bisect.bisect_right(a, v)
        c2 = bisect.bisect_right(b, v)
        d = abs(c1 * n2 - c2 * n1)
        if d > best or (d == best and v < arg):
            best, arg = d, v
    (r,) = _rows("ks_two_sample_prices", spark, sf_dir)
    assert (r["n1"], r["n2"], r["d_num"], r["arg_cents"]) == \
        (n1, n2, best, arg)
    assert 0 <= r["d_num"] <= n1 * n2
    assert r["d_micro"] == _half_away(float(best * 1_000_000)
                                      / (n1 * n2))
    assert r["reject05"] in (0, 1) and r["reject01"] in (0, 1)
    assert r["reject01"] <= r["reject05"]  # 1% is the stricter test


# ---------------------------------------------------------------- X284
def test_brown_forsythe_replay(spark, sf_dir):
    rows = duckdb.sql(f"""
        SELECT n.n_name,
               CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/supplier.parquet' s
          ON s.s_suppkey = l.l_suppkey
        JOIN '{sf_dir}/nation.parquet' n
          ON n.n_nationkey = s.s_nationkey""").fetchall()
    groups: dict = {}
    for g, x in rows:
        groups.setdefault(g, []).append(int(x))
    med2, dev = {}, {}
    for g, xs in groups.items():
        xs.sort()
        n = len(xs)
        med2[g] = xs[(n + 1) // 2 - 1] + xs[(n + 2) // 2 - 1]
        dev[g] = [abs(2 * x - med2[g]) for x in xs]
    nj = {g: len(z) for g, z in dev.items()}
    zj = {g: sum(z) for g, z in dev.items()}
    n_tot, z_tot, k = sum(nj.values()), sum(zj.values()), len(dev)
    zbar = {g: _half_away(float(zj[g] * 1_000_000) / nj[g])
            for g in dev}
    zbar_all = _half_away(float(z_tot * 1_000_000) / n_tot)
    ssb = sum(nj[g] * (zbar[g] - zbar_all) ** 2 for g in dev)
    ssw = sum((z * 1_000_000 - zbar[g]) ** 2
              for g, zs in dev.items() for z in zs)
    f_micro = _half_away(float(ssb) * (n_tot - k) * 1_000_000
                         / (float(ssw) * (k - 1)))
    for r in _rows("brown_forsythe_nations", spark, sf_dir):
        g = r["grp"]
        assert (r["nj"], r["zj"], r["zbar_micro"]) == \
            (nj[g], zj[g], zbar[g])
        assert (r["n_total"], r["k"], r["f_micro"]) == \
            (n_tot, k, f_micro)


# ---------------------------------------------------------------- X285
def test_sprt_replay_and_latch(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import (
        SPRT_A_MICRO, SPRT_B_MICRO, SPRT_C1_MICRO, SPRT_C2_MICRO,
        SPRT_EVENT)

    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*),
               SUM(CASE WHEN event_type = '{SPRT_EVENT}' THEN 1
                        ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    cn = ck = 0
    expect = []
    d_day, d_state = None, None
    for day, n, k in daily:
        cn += int(n)
        ck += int(k)
        llr = ck * SPRT_C1_MICRO + (cn - ck) * SPRT_C2_MICRO
        if d_day is None and llr >= SPRT_A_MICRO:
            d_day, d_state = day, "accept_h1"
        elif d_day is None and llr <= SPRT_B_MICRO:
            d_day, d_state = day, "accept_h0"
        state = "continue" if (d_day is None or day < d_day) \
            else d_state
        expect.append((day, int(n), int(k), cn, ck, llr, state))
    got = sorted((r["day"], r["n"], r["k"], r["cum_n"], r["cum_k"],
                  r["llr_micro"], r["state"])
                 for r in _rows("sprt_conversion_monitor",
                                spark, sf_dir))
    assert got == sorted(expect)
    # latch monotonicity: once decided, the state never reverts
    states = [s for *_, s in sorted(expect)]
    if any(s != "continue" for s in states):
        first = next(i for i, s in enumerate(states) if s != "continue")
        assert all(s == states[first] for s in states[first:])


# ---------------------------------------------------------------- X286
def test_mcnemar_replay_and_partition(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import (MCN_PRICE_CENTS,
                                                      MCN_QTY)

    rows = duckdb.sql(f"""
        SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT),
               l_quantity, l_returnflag
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    cc = b = c = dd = 0
    for cents, qty, flag in rows:
        y = flag == "R"
        a_ok = (cents >= MCN_PRICE_CENTS) == y
        b_ok = (qty >= MCN_QTY) == y
        cc += a_ok and b_ok
        b += a_ok and not b_ok
        c += b_ok and not a_ok
        dd += not a_ok and not b_ok
    n = len(rows)
    (r,) = _rows("mcnemar_paired_rules", spark, sf_dir)
    assert (r["both_correct"], r["only_price"], r["only_qty"],
            r["both_wrong"], r["n"]) == (cc, b, c, dd, n)
    assert cc + b + c + dd == n  # cells partition the sample
    if b + c:
        assert r["chi2_micro"] == _half_away(
            float((b - c) ** 2 * 1_000_000) / (b + c))
        e = max(abs(b - c) - 1, 0)
        assert r["chi2_cc_micro"] == _half_away(
            float(e * e * 1_000_000) / (b + c))
    assert r["chi2_cc_micro"] <= r["chi2_micro"]
    assert r["acc_price_micro"] == _half_away(
        float((cc + b) * 1_000_000) / n)
    assert r["acc_qty_micro"] == _half_away(
        float((cc + c) * 1_000_000) / n)
