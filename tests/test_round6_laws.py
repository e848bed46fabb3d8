"""Property laws for the round-6 operator classes (X254-X263): each
query's oracle pins exact values; these pin the ALGEBRA the values
must satisfy via independent pure-Python replays, so a future rewrite
can't drift into plausibly-wrong output."""

from __future__ import annotations

import hashlib

import duckdb

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- X254
def test_rbo_replay_and_bounds(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.relational import RBO_DEPTH

    stats = duckdb.sql(f"""
        SELECT p.p_brand,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                   * 100, 0) AS BIGINT)) AS rev,
               SUM(CAST(l.l_quantity AS BIGINT)) AS qty
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        GROUP BY 1""").fetchall()
    by_rev = sorted(stats, key=lambda r: (-r[1], r[0]))
    by_qty = sorted(stats, key=lambda r: (-r[2], r[0]))
    rx = {r[0]: i + 1 for i, r in enumerate(by_rev)}
    ry = {r[0]: i + 1 for i, r in enumerate(by_qty)}
    md = sorted(max(rx[b], ry[b]) for b in rx)
    got = sorted(_rows("rbo_rank_overlap", spark, sf_dir))
    acc = 0
    for d, inter_d, a_micro, rbo_partial in got:
        exp_inter = sum(1 for m in md if m <= d)
        assert inter_d == exp_inter
        assert a_micro == inter_d * 1_000_000 // d
        assert 0 <= a_micro <= 1_000_000
        w = round(0.9 ** (d - 1) * 1_000_000)
        acc += w * inter_d // d
        assert rbo_partial == acc // 10
    # partial RBO is nondecreasing in depth and <= 1
    partials = [r[3] for r in got]
    assert partials == sorted(partials)
    assert partials[-1] <= 1_000_000
    assert len(got) == RBO_DEPTH


# ---------------------------------------------------------------- X255
def test_randomized_response_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import RR_CATS, RR_KEEP_PCT

    evs = duckdb.sql(f"""SELECT event_id, event_type
                         FROM '{sf_dir}/events.parquet'""").fetchall()
    true_n: dict = {}
    obs_n: dict = {}
    for eid, et in evs:
        true_n[et] = true_n.get(et, 0) + 1
        if _h60(f"rrc:{eid}") % 100 < RR_KEEP_PCT:
            rep = et
        else:
            rep = RR_CATS[_h60(f"rrf:{eid}") % 5]
        obs_n[rep] = obs_n.get(rep, 0) + 1
    n = len(evs)
    got = {r["event_type"]: r
           for r in _rows("randomized_response_freq", spark, sf_dir)}
    assert sum(r["obs_n"] for r in got.values()) == n
    for cat, row in got.items():
        assert row["true_n"] == true_n[cat]
        assert row["obs_n"] == obs_n[cat]
        est = ((row["obs_n"] * 1_000_000 - (n * 1_000_000) // 20) * 4) // 3
        assert row["est_micro"] == est
        assert row["abs_err_micro"] == abs(est - row["true_n"] * 1_000_000)


# ---------------------------------------------------------------- X256
def test_brier_decomposition_identity(spark, sf_dir):
    (row,) = _rows("brier_decomposition", spark, sf_dir)
    assert row["rel_micro"] >= 0 and row["res_micro"] >= 0
    assert 0 <= row["unc_micro"] <= 250_000  # p(1-p) <= 1/4
    # Murphy identity holds exactly only for DISCRETE forecasts; with
    # decile-binned continuous forecasts the gap is the within-bin
    # variance/covariance residual (Stephenson et al. 2008) plus
    # flooring dust — small but nonzero. Bound it at 1% of the score
    # scale.
    assert abs(row["decomp_gap_micro"]) <= 10_000
    assert row["decomp_gap_micro"] == row["brier_micro"] - (
        row["rel_micro"] - row["res_micro"] + row["unc_micro"])


# ---------------------------------------------------------------- X257
def test_window_funnel_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import (
        WF_STEPS, WF_WINDOW_US)

    evs = duckdb.sql(f"""SELECT user_id, event_type, epoch_us(ts)
                         FROM '{sf_dir}/events.parquet'""").fetchall()
    by_user: dict = {}
    for u, et, us in evs:
        by_user.setdefault(u, []).append((us, et))
    depths: dict = {}
    for u, rows in by_user.items():
        t_prev = None
        anchor = None
        depth = 0
        for step in WF_STEPS:
            cand = [us for us, et in rows if et == step
                    and (t_prev is None or us > t_prev)
                    and (anchor is None or us <= anchor + WF_WINDOW_US)]
            if not cand:
                break
            t_prev = min(cand)
            if anchor is None:
                anchor = t_prev
            depth += 1
        depths[depth] = depths.get(depth, 0) + 1
    got = {r["depth"]: r["n_users"]
           for r in _rows("window_funnel_depths", spark, sf_dir)}
    assert got == depths
    assert sum(got.values()) == len(by_user)


# ---------------------------------------------------------------- X258
def test_horvitz_thompson_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.sampling import HT_PI_DIVISOR

    rows = duckdb.sql(f"""
        SELECT r.r_name, o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_dir}/nation.parquet' n
          ON n.n_nationkey = c.c_nationkey
        JOIN '{sf_dir}/region.parquet' r
          ON r.r_regionkey = n.n_regionkey""").fetchall()
    agg: dict = {}
    for reg, okey, cents in rows:
        a = agg.setdefault(reg, [0, 0, 0, 0])  # n, true, n_s, ht
        a[0] += 1
        a[1] += cents
        pi = min(1_000_000, cents // HT_PI_DIVISOR)
        if _h60(f"ht:{okey}") % 1_000_000 < pi:
            a[2] += 1
            a[3] += (cents * 1_000_000) // pi
    got = {r["region"]: r
           for r in _rows("horvitz_thompson_regions", spark, sf_dir)}
    assert set(got) == set(agg)
    for reg, (n, true_c, n_s, ht) in agg.items():
        row = got[reg]
        assert (row["n"], row["true_cents"], row["n_sampled"],
                row["ht_est_cents"]) == (n, true_c, n_s, ht)
        assert row["abs_err_permille"] == abs(ht - true_c) * 1000 // true_c
        assert row["n_sampled"] <= row["n"]
    # global HT total: variance pools across regions, so the estimate
    # tightens even at sf0.001 (per-region errors can be large there)
    ht_tot = sum(r["ht_est_cents"] for r in got.values())
    true_tot = sum(r["true_cents"] for r in got.values())
    assert abs(ht_tot - true_tot) * 1000 // true_tot <= 400


# ---------------------------------------------------------------- X259
def test_peak_prominence_replay(spark, sf_dir):
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE), COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()
    from etl_airflow_spotify_spark.queries.events_ops import PEAK_MIN_PROM
    ns = [n for _, n in daily]
    exp = {}
    for i in range(1, len(ns) - 1):
        if not (ns[i] > ns[i - 1] and ns[i] > ns[i + 1]):
            continue
        left = [j for j in range(i) if ns[j] > ns[i]]
        lo = max(left) + 1 if left else 0
        lmin = min(ns[lo:i])
        right = [j for j in range(i + 1, len(ns)) if ns[j] > ns[i]]
        hi = min(right) if right else len(ns)
        rmin = min(ns[i + 1:hi])
        prom = ns[i] - max(lmin, rmin)
        if prom >= PEAK_MIN_PROM:
            exp[daily[i][0]] = (ns[i], prom)
    got = {r["day"]: (r["n"], r["prominence"])
           for r in _rows("daily_peak_prominence", spark, sf_dir)}
    assert got == exp
    for day, (n, prom) in got.items():
        assert 0 < prom <= n - min(ns)


# ---------------------------------------------------------------- X260
def test_esd_replay(spark, sf_dir):
    import math

    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
                   // COUNT(*) AS x
        FROM '{sf_dir}/events.parquet' GROUP BY 1""").fetchall()
    from etl_airflow_spotify_spark.queries.events_ops import ESD_ROUNDS
    pts = {d: x for d, x in daily}
    exp = []
    for r in range(ESD_ROUNDS):
        n = len(pts)
        sx = sum(pts.values())
        sxx = sum(x * x for x in pts.values())
        day, x = min(pts.items(), key=lambda kv: (-abs(kv[1] * n - sx),
                                                  kv[0]))
        denom = math.ceil(math.sqrt(n * (n * sxx - sx * sx)))
        exp.append((r + 1, day, x,
                    (abs(x * n - sx) * 1_000_000) // denom))
        del pts[day]
    got = sorted(tuple(r) for r in _rows("esd_outlier_rounds",
                                         spark, sf_dir))
    assert got == sorted(exp)
    assert len({d for _, d, _, _ in got}) == ESD_ROUNDS  # distinct days
    for _, _, _, r_micro in got:
        assert r_micro > 0


# ---------------------------------------------------------------- X261
def test_stream_ph_equals_batch(spark, sf_dir):
    batch = sorted(tuple(r) for r in _rows("page_hinkley_drift",
                                           spark, sf_dir))
    stream = sorted(tuple(r) for r in _rows("stream_page_hinkley",
                                            spark, sf_dir))
    assert stream == batch  # mergeable partials: bit-identical detector


# ---------------------------------------------------------------- X262
def test_mondrian_partition_laws(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import MONDRIAN_ROUNDS

    got = _rows("mondrian_kanon_partition", spark, sf_dir)
    (n_total,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'").fetchone()
    assert sum(r["n"] for r in got) == n_total  # leaves partition rows
    for r in got:
        assert len(r["cell"]) == MONDRIAN_ROUNDS
        assert r["q_min"] <= r["q_max"]
        assert r["pr_min"] <= r["pr_max"]
    # round-1 split separates quantity: every L* leaf sits at or below
    # every R* leaf on q
    lmax = max(r["q_max"] for r in got if r["cell"][0] == "L")
    rmin = min(r["q_min"] for r in got if r["cell"][0] == "R")
    assert lmax <= rmin


# ---------------------------------------------------------------- X263
def test_loo_influence_replay(spark, sf_dir):
    pts = duckdb.sql(f"""
        SELECT p.p_brand, CAST(l.l_quantity AS BIGINT),
               CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p
          ON p.p_partkey = l.l_partkey""").fetchall()
    g: dict = {}
    for b, x, y in pts:
        a = g.setdefault(b, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += x * y
    tn = sum(a[0] for a in g.values())
    tsx = sum(a[1] for a in g.values())
    tsy = sum(a[2] for a in g.values())
    tsxx = sum(a[3] for a in g.values())
    tsxy = sum(a[4] for a in g.values())

    def slope_micro(n, sx, sy, sxx, sxy):
        den = float(n) * sxx - float(sx) * sx
        if den <= 0:
            return 0
        return round((float(n) * sxy - float(sx) * sy) / den * 1e6)

    b_full = slope_micro(tn, tsx, tsy, tsxx, tsxy)
    got = {r["brand"]: r for r in _rows("loo_group_influence",
                                        spark, sf_dir)}
    assert set(got) == set(g)
    for brand, (n, sx, sy, sxx, sxy) in g.items():
        row = got[brand]
        b_loo = slope_micro(tn - n, tsx - sx, tsy - sy,
                            tsxx - sxx, tsxy - sxy)
        assert row["n_g"] == n
        assert row["b_full_micro"] == b_full
        assert row["b_loo_micro"] == b_loo
        assert row["dfbeta_micro"] == b_loo - b_full


# ---------------------------------------------------------------- X264
def test_scc_tarjan_replay(spark, sf_dir):
    from collections import defaultdict, deque

    from etl_airflow_spotify_spark.queries.graph import SCC_QMIN

    rows = duckdb.sql(f"""
        WITH seq AS (SELECT l_orderkey AS o, l_linenumber AS ln,
                            l_partkey AS p
                     FROM '{sf_dir}/lineitem.parquet'
                     WHERE l_quantity >= {SCC_QMIN})
        SELECT DISTINCT a.p, b.p FROM seq a
        JOIN seq b ON a.o = b.o AND b.ln = a.ln + 1
        WHERE a.p <> b.p""").fetchall()
    adj = defaultdict(list)
    radj = defaultdict(list)
    nodes = set()
    for s, d in rows:
        adj[s].append(d)
        radj[d].append(s)
        nodes.update((s, d))
    pivot = min(nodes)

    def bfs(start, g):
        seen = {start}
        q = deque([start])
        while q:
            u = q.popleft()
            for v in g[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    fw, bw = bfs(pivot, adj), bfs(pivot, radj)
    got = {r["metric"]: r["value"]
           for r in _rows("scc_pivot_fwbw", spark, sf_dir)}
    assert got["n_nodes"] == len(nodes)
    assert got["n_edges"] == len(rows)
    assert got["fw_size"] == len(fw)
    assert got["bw_size"] == len(bw)
    assert got["pivot_scc_size"] == len(fw & bw)
    assert got["trim_no_out"] == sum(1 for v in nodes if not adj[v])
    assert got["trim_no_in"] == sum(1 for v in nodes if not radj[v])
    # FW ∩ BW really is the pivot's SCC: mutually reachable via pivot
    assert got["pivot_scc_size"] <= min(got["fw_size"], got["bw_size"])


# ---------------------------------------------------------------- X265
def test_roaring_pricing_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.scale import ROARING_CHUNK

    keys = duckdb.sql(f"""
        SELECT DISTINCT l.l_returnflag, o.o_orderkey
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o
          ON o.o_orderkey = l.l_orderkey""").fetchall()
    by_cont: dict = {}
    for flag, k in keys:
        by_cont.setdefault((flag, k // ROARING_CHUNK), []).append(k)
    agg: dict = {}
    for (flag, _), ks in by_cont.items():
        ks.sort()
        n = len(ks)
        n_runs = 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)
        run_b, arr_b = 4 * n_runs, 2 * n
        if run_b <= arr_b and run_b <= 8192:
            w, chosen = "run", run_b
        elif arr_b <= 8192:
            w, chosen = "array", arr_b
        else:
            w, chosen = "bitmap", 8192
        a = agg.setdefault((flag, w), [0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += chosen
        a[3] += 8192
    got = {(r["flag"], r["winner"]): (r["n_containers"], r["n_keys"],
                                      r["bytes_chosen"],
                                      r["bytes_flat_bitmap"])
           for r in _rows("roaring_container_plan", spark, sf_dir)}
    assert got == {k: tuple(v) for k, v in agg.items()}
    # the chosen encoding never loses to the flat-bitmap strawman
    for (nc, nk, chosen, flat) in got.values():
        assert chosen <= flat


# ---------------------------------------------------------------- X266
def test_fagin_ta_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.scale import TA_DEPTHS, TA_K

    s = duckdb.sql(f"""
        SELECT l_partkey,
               SUM(CAST(l_quantity AS BIGINT)),
               SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1""").fetchall()
    by_q = sorted(s, key=lambda r: (-r[1], r[0]))
    by_r = sorted(s, key=lambda r: (-r[2], r[0]))
    rq = {r[0]: i + 1 for i, r in enumerate(by_q)}
    rr = {r[0]: i + 1 for i, r in enumerate(by_r)}
    f = {r[0]: r[1] + r[2] for r in s}
    got = {r["depth"]: r for r in _rows("fagin_ta_depth", spark, sf_dir)}
    assert set(got) == set(TA_DEPTHS)
    prev_stopped = 0
    for d in sorted(TA_DEPTHS):
        row = got[d]
        thr = (by_q[d - 1][1] + by_r[d - 1][2]) if d <= len(s) else None
        assert row["threshold"] == thr
        seen = [i for i in f if min(rq[i], rr[i]) <= d]
        assert row["n_seen"] == len(seen)
        top = sorted((f[i] for i in seen), reverse=True)[:TA_K]
        kth = top[TA_K - 1] if len(top) >= TA_K else (
            min(top) if top else None)
        assert row["kth_best"] == kth
        exp_stop = 1 if (len(seen) >= TA_K and thr is not None
                         and kth >= thr) else 0
        assert row["stopped"] == exp_stop
        # once TA stops it stays stopped at deeper audit depths
        # (threshold is nonincreasing, kth-best nondecreasing) —
        # unless the threshold goes NULL past the list end
        if thr is not None:
            assert row["stopped"] >= prev_stopped
            prev_stopped = row["stopped"]


def _quantized_embeddings(sf_dir):
    """Integer 1e-6-grid embeddings + labels, quantized by DuckDB so
    the replay starts from the exact arrays both engines use."""
    return duckdb.sql(f"""
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(ROUND(x * 1000000, 0) AS BIGINT))
        FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id""").fetchall()


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _half_away(x: float) -> int:
    import math
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------- X267
def test_knn_shapley_replay_and_efficiency(spark, sf_dir):
    from fractions import Fraction

    from etl_airflow_spotify_spark.queries.similarity import (
        KSV_K, KSV_NANO, KSV_TEST_MOD)

    pts = _quantized_embeddings(sf_dir)
    tests = [(v, l, e) for v, l, e in pts if v % KSV_TEST_MOD == 0]
    train = [(v, l, e) for v, l, e in pts if v % KSV_TEST_MOD != 0]
    n = len(train)
    sv_nano: dict = {}
    match_tests: dict = {}
    for t_id, t_label, t_e in tests:
        ranked = sorted(((_d2(t_e, e), v, l) for v, l, e in train))
        ms = [1 if l == t_label else 0 for _, _, l in ranked]
        # nano-snapped per-rank terms, replayed with half-away rounding
        terms = []
        for j0 in range(n):
            j = j0 + 1
            if j == n:
                terms.append(_half_away(ms[j0] * KSV_NANO / n))
            else:
                terms.append(_half_away(
                    (ms[j0] - ms[j0 + 1]) * min(KSV_K, j)
                    * KSV_NANO / (KSV_K * j)))
        suffix = 0
        svs = [0] * n
        for j0 in range(n - 1, -1, -1):
            suffix += terms[j0]
            svs[j0] = suffix
        for (d, v, l), s, m in zip(ranked, svs, ms):
            sv_nano[v] = sv_nano.get(v, 0) + s
            match_tests[v] = match_tests.get(v, 0) + m
        # efficiency axiom in EXACT Fractions (unsnapped recurrence):
        # the values sum to the full-set KNN utility = matches@K / K
        s_exact = Fraction(ms[-1], n)
        total = s_exact
        for j0 in range(n - 2, -1, -1):
            j = j0 + 1
            s_exact = s_exact + Fraction(
                (ms[j0] - ms[j0 + 1]) * min(KSV_K, j), KSV_K * j)
            total += s_exact
        assert total == Fraction(sum(ms[:KSV_K]), KSV_K)
    got = {r["vec_id"]: r
           for r in _rows("knn_shapley_valuation", spark, sf_dir)}
    assert set(got) == set(sv_nano)
    for v, row in got.items():
        assert row["sv_nano"] == sv_nano[v]
        assert row["n_tests"] == len(tests)
        assert row["n_match_tests"] == match_tests[v]


# ---------------------------------------------------------------- X268
def test_mmr_replay_first_pick_and_diversity(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import (
        MMR_K, MMR_POOL, MMR_QUERY_MOD)

    pts = _quantized_embeddings(sf_dir)
    emb = {v: e for v, _, e in pts}
    queries = [v for v in emb if v % MMR_QUERY_MOD == 0]
    got: dict = {}
    for r in _rows("mmr_diverse_topk", spark, sf_dir):
        got.setdefault(r["query_id"], []).append(r)
    assert set(got) == set(queries)
    for q in queries:
        rel = sorted((_d2(emb[q], emb[v]), v) for v in emb if v != q)
        pool = rel[:MMR_POOL]
        rel_d2 = {v: d for d, v in pool}
        sel = [pool[0][1]]  # first pick = nearest neighbor
        scores = {sel[0]: None}
        while len(sel) < MMR_K:
            best = None
            for d, v in pool:
                if v in sel:
                    continue
                mind = min(_d2(emb[v], emb[s]) for s in sel)
                key = (-(mind - d), v)
                if best is None or key < best[0]:
                    best = (key, v, mind - d)
            sel.append(best[1])
            scores[best[1]] = best[2]
        rows = sorted(got[q], key=lambda r: r["pick_rank"])
        assert [r["vec_id"] for r in rows] == sel
        assert [r["pick_rank"] for r in rows] == list(range(1, MMR_K + 1))
        for r in rows:
            assert r["rel_d2"] == rel_d2[r["vec_id"]]
            assert r["mmr_score"] == scores[r["vec_id"]]
        # diversity: the MMR picks' min pairwise distance is at least
        # the plain top-k picks' (the operator's raison d'etre;
        # holds on this corpus, pinned as a regression tripwire)
        topk = [v for _, v in pool[:MMR_K]]

        def min_pair(vs):
            return min(_d2(emb[a], emb[b])
                       for i, a in enumerate(vs) for b in vs[i + 1:])

        assert min_pair(sel) >= min_pair(topk)


def test_knn_shapley_closed_form_equals_bruteforce():
    """X267 formula validation: for tiny point sets, the Jia closed-form
    recurrence must equal the DEFINITIONAL Shapley value — exact
    Fractions enumeration of all 2^n coalitions with utility
    v(S) = (1/K) * sum_{j <= min(K,|S|)} 1[label of S's j-th nearest
    = test label] — for every point, every K, and several label
    patterns. This pins the math itself, independent of any engine."""
    from fractions import Fraction
    from itertools import combinations
    from math import factorial

    def closed_form(ms, k):
        n = len(ms)
        s = [Fraction(0)] * n
        s[n - 1] = Fraction(ms[n - 1], n)
        for j0 in range(n - 2, -1, -1):
            j = j0 + 1
            s[j0] = s[j0 + 1] + Fraction(
                (ms[j0] - ms[j0 + 1]) * min(k, j), k * j)
        return s

    def brute_force(ms, k):
        # ms[i] = 1 iff train point with distance-rank i+1 matches the
        # test label; nearer rank = smaller index, so a coalition's
        # j-th nearest is just its j-th smallest index.
        n = len(ms)
        idx = list(range(n))

        def v(coal):
            chosen = sorted(coal)[:k]
            return Fraction(sum(ms[i] for i in chosen), k)

        out = []
        for i in idx:
            rest = [j for j in idx if j != i]
            sv = Fraction(0)
            for r in range(n):
                w = Fraction(factorial(r) * factorial(n - r - 1),
                             factorial(n))
                for coal in combinations(rest, r):
                    sv += w * (v(coal + (i,)) - v(coal))
            out.append(sv)
        return out

    patterns = [
        (1, 0, 1, 1, 0, 0),
        (0, 0, 0, 0, 0, 1),
        (1, 1, 1, 1, 1, 1),
        (0, 1, 0, 1, 0, 1),
        (1, 0, 0, 0, 0, 0),
    ]
    for ms in patterns:
        for k in (1, 2, 3, 5):
            assert closed_form(list(ms), k) == brute_force(list(ms), k), \
                (ms, k)
