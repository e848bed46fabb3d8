"""Property laws for the round-7 operator classes (X269-X277): each
query's oracle pins exact values; these pin the ALGEBRA the values
must satisfy via independent pure-Python replays, so a future rewrite
can't drift into plausibly-wrong output."""

from __future__ import annotations

import hashlib
import math

import duckdb

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def _half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _daily_counts(sf_dir):
    return duckdb.sql(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()


# ---------------------------------------------------------------- X269
def test_holt_winters_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import HW_SEASON

    daily = _daily_counts(sf_dir)
    xs = [n * 1_000_000 for _, n in daily]
    m = HW_SEASON
    l = sum(xs[:m]) // m
    b = 0
    s = [x - l for x in xs[:m]]
    expect = []
    for t in range(m, len(xs)):
        x, s0 = xs[t], s[0]
        err = x - (l + b + s0)
        l_new = (x - s0 + l + b) // 2
        b_new = (l_new - l + 3 * b) // 4
        s_new = (x - l_new + s0) // 2
        expect.append((daily[t][0], x // 1_000_000,
                       l_new, b_new, s_new, err))
        l, b = l_new, b_new
        s = s[1:] + [s_new]
    got = sorted((r["day"], r["n"], r["level_micro"], r["trend_micro"],
                  r["seasonal_micro"], r["err_micro"])
                 for r in _rows("holt_winters_daily", spark, sf_dir))
    assert got == sorted(expect)
    assert len(got) == len(xs) - m


# ---------------------------------------------------------------- X270
def test_auction_replay_and_near_optimality(spark, sf_dir):
    from itertools import permutations

    from etl_airflow_spotify_spark.queries.similarity import (
        AUC_EPS, AUC_N, AUC_ROUNDS)

    rev = duckdb.sql(f"""
        SELECT l.l_suppkey AS sk, p.p_brand AS brand,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                   * 100 + 0.5) AS BIGINT)) AS v
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2""").fetchall()
    by_sk, by_brand = {}, {}
    for sk, brand, v in rev:
        by_sk[sk] = by_sk.get(sk, 0) + v
        by_brand[brand] = by_brand.get(brand, 0) + v
    bidders = sorted(by_sk, key=lambda k: (-by_sk[k], k))[:AUC_N]
    objs = sorted(by_brand, key=lambda k: (-by_brand[k], k))[:AUC_N]
    vmap = {(sk, b): 0 for sk in bidders for b in objs}
    for sk, brand, v in rev:
        if (sk, brand) in vmap:
            vmap[(sk, brand)] = int(v)
    prices = {b: 0 for b in objs}
    owner = {}
    for _ in range(AUC_ROUNDS):
        held = {sk for sk, _ in owner.values()}
        unas = [sk for sk in bidders if sk not in held]
        if not unas:
            continue
        best = {}
        for sk in unas:
            nets = sorted(((vmap[(sk, b)] - prices[b], b)
                           for b in objs), key=lambda t: (-t[0], t[1]))
            (n1, b1), (n2, _) = nets[0], nets[1]
            bid = prices[b1] + n1 - n2 + AUC_EPS
            if b1 not in best or (bid, -sk) > (best[b1][1],
                                               -best[b1][0]):
                best[b1] = (sk, bid)
        for b, (sk, bid) in best.items():
            owner[b] = (sk, bid)
            prices[b] = bid
    got = {r["suppkey"]: r for r in
           _rows("auction_assignment", spark, sf_dir)}
    assert set(got) == set(bidders)
    total = 0
    for b, (sk, bid) in owner.items():
        assert got[sk]["brand"] == b
        assert got[sk]["payoff_centi"] == vmap[(sk, b)]
        assert got[sk]["price_centi"] == prices[b]
        total += vmap[(sk, b)]
    # eps-complementary slackness: within N*eps of the optimal sum
    # (exact brute force over AUC_N! assignments)
    opt = max(sum(vmap[(sk, b)] for sk, b in zip(bidders, perm))
              for perm in permutations(objs))
    if len(owner) == AUC_N:  # converged -> the guarantee applies
        assert total >= opt - AUC_N * AUC_EPS


# ---------------------------------------------------------------- X271
def test_lossy_counting_replay_and_guarantees(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.sketches import LC_BUCKETS

    stream = duckdb.sql(
        f"""SELECT user_id FROM '{sf_dir}/events.parquet'
            ORDER BY ts, event_id""").fetchall()
    n = len(stream)
    d: dict = {}
    true: dict = {}
    prev_bucket = 1
    for i, (item,) in enumerate(stream):
        b = (i * LC_BUCKETS) // n + 1
        if b != prev_bucket:  # bucket boundary: prune
            d = {k: v for k, v in d.items()
                 if v[0] + v[1] > prev_bucket}
            prev_bucket = b
        true[item] = true.get(item, 0) + 1
        if item in d:
            d[item] = (d[item][0] + 1, d[item][1])
        else:
            d[item] = (1, b - 1)
    d = {k: v for k, v in d.items() if v[0] + v[1] > LC_BUCKETS}
    got = {r["user_id"]: (r["f"], r["delta"])
           for r in _rows("lossy_count_users", spark, sf_dir)}
    assert got == d
    for item, (f, delta) in got.items():
        assert f <= true[item] <= f + delta  # MM error guarantee
        assert delta <= LC_BUCKETS - 1
    thresh = n / LC_BUCKETS
    for item, cnt in true.items():  # no false negatives above eps*N
        if cnt > thresh:
            assert item in got


# ---------------------------------------------------------------- X272
def test_fairness_audit_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.ml import (FAIR_LABEL,
                                                      FAIR_THRESH)

    base = duckdb.sql(f"""
        SELECT n.n_name,
               SUM(CASE WHEN l.l_returnflag = '{FAIR_LABEL}'
                   THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                   AS BIGINT) >= {FAIR_THRESH} THEN 1 ELSE 0 END)
                   AS sel,
               SUM(CASE WHEN l.l_returnflag = '{FAIR_LABEL}'
                   AND CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                       AS BIGINT) >= {FAIR_THRESH}
                   THEN 1 ELSE 0 END) AS tp,
               COUNT(*) AS n
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o
             ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_dir}/customer.parquet' c
             ON c.c_custkey = o.o_custkey
        JOIN '{sf_dir}/nation.parquet' n
             ON n.n_nationkey = c.c_nationkey
        GROUP BY 1""").fetchall()
    tn_ = sum(r[4] for r in base)
    tpos = sum(r[1] for r in base)
    tsel = sum(r[2] for r in base)
    ttp = sum(r[3] for r in base)
    tfp = tsel - ttp
    sel_all = _half_away(tsel * 1_000_000.0 / tn_)
    tpr_all = _half_away(ttp * 1_000_000.0 / tpos)
    fpr_all = _half_away(tfp * 1_000_000.0 / (tn_ - tpos))
    got = {r["grp"]: r for r in
           _rows("fairness_group_audit", spark, sf_dir)}
    assert len(got) == len(base)
    for name, pos, sel, tp, n in base:
        r = got[name]
        fp = sel - tp
        assert (r["n"], r["n_pos"], r["n_sel"], r["tp"], r["fp"]) \
            == (n, pos, sel, tp, fp)
        assert r["tp"] <= r["n_pos"] and r["fp"] <= r["n"] - r["n_pos"]
        sel_m = _half_away(sel * 1_000_000.0 / n)
        tpr_m = _half_away(tp * 1_000_000.0 / pos) if pos else 0
        fpr_m = _half_away(fp * 1_000_000.0 / (n - pos)) \
            if n - pos else 0
        assert r["sel_micro"] == sel_m
        assert r["dp_gap_micro"] == sel_m - sel_all
        assert r["tpr_gap_micro"] == tpr_m - tpr_all
        assert r["fpr_gap_micro"] == fpr_m - fpr_all


# ---------------------------------------------------------------- X273
def test_cmh_replay_and_marginals(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.relational import (
        CMH_DISC_CENTI, CMH_LABEL)

    st = duckdb.sql(f"""
        SELECT o.o_orderpriority,
               SUM(CASE WHEN CAST(FLOOR(l.l_discount * 100 + 0.5)
                   AS BIGINT) >= {CMH_DISC_CENTI}
                   AND l.l_returnflag = '{CMH_LABEL}'
                   THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN CAST(FLOOR(l.l_discount * 100 + 0.5)
                   AS BIGINT) >= {CMH_DISC_CENTI}
                   AND l.l_returnflag <> '{CMH_LABEL}'
                   THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN CAST(FLOOR(l.l_discount * 100 + 0.5)
                   AS BIGINT) < {CMH_DISC_CENTI}
                   AND l.l_returnflag = '{CMH_LABEL}'
                   THEN 1 ELSE 0 END) AS c,
               COUNT(*) AS n
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o
             ON o.o_orderkey = l.l_orderkey
        GROUP BY 1""").fetchall()
    got = {r["stratum"]: r for r in
           _rows("cmh_stratified_assoc", spark, sf_dir)}
    assert len(got) == len(st) + 1
    s_nano = v_sum = ad_sum = bc_sum = 0
    for prio, a, b, c, n in st:
        d = n - a - b - c
        r = got[prio]
        assert (r["a"], r["b"], r["c"], r["d"], r["n"]) \
            == (a, b, c, d, n)
        e = _half_away(float(a + b) * (a + c) * 1e9 / n)
        v = _half_away(float(a + b) * (c + d) * (a + c) * (b + d)
                       * 1e9 / (float(n) * n * (n - 1)))
        ad = _half_away(float(a) * d * 1e9 / n)
        bc = _half_away(float(b) * c * 1e9 / n)
        assert (r["e_nano"], r["v_nano"], r["ad_nano"], r["bc_nano"]) \
            == (e, v, ad, bc)
        s_nano += a * 1_000_000_000 - e
        v_sum += v
        ad_sum += ad
        bc_sum += bc
    allr = got["ALL"]
    assert allr["n"] == sum(r[4] for r in st)
    assert allr["e_nano"] == s_nano and allr["v_nano"] == v_sum
    assert allr["chi2_micro"] == _half_away(
        float(s_nano) * s_nano / v_sum / 1000.0)
    assert allr["or_micro"] == _half_away(
        float(ad_sum) * 1_000_000.0 / bc_sum)


# ---------------------------------------------------------------- X274
def test_readability_replay_and_bounds(spark, sf_dir):
    import re

    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    agg: dict = {}
    for source, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        w = max(len(toks), 1)
        t = re.sub(r"[.!?]+", "|", text)
        s = max(len(t) - len(t.replace("|", "")), 1)
        y = 0
        for tok in toks:
            u = re.sub(r"[aeiouy]+", "#", tok)
            y += max(1, len(u) - len(u.replace("#", "")))
        grade = (_half_away(390000.0 * w / s)
                 + _half_away(11800000.0 * y / w) - 15590000)
        cur = agg.setdefault(source, [0, 0, 0, 0, 0, None, None])
        cur[0] += 1
        cur[1] += w
        cur[2] += s
        cur[3] += y
        cur[4] += grade
        cur[5] = grade if cur[5] is None else min(cur[5], grade)
        cur[6] = grade if cur[6] is None else max(cur[6], grade)
    got = {r["source"]: r for r in
           _rows("readability_fk_profile", spark, sf_dir)}
    assert set(got) == set(agg)
    for source, (nd, sw, ss, sy, sg, mn, mx) in agg.items():
        r = got[source]
        assert (r["n_docs"], r["sum_words"], r["sum_sentences"],
                r["sum_syllables"], r["sum_grade_micro"],
                r["min_grade_micro"], r["max_grade_micro"]) \
            == (nd, sw, ss, sy, sg, mn, mx)
        assert r["mean_grade_micro"] == _half_away(float(sg) / nd)
        assert r["sum_syllables"] >= r["sum_words"]  # >=1 per word


# ---------------------------------------------------------------- X275
def test_binseg_greedy_replay(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.events_ops import (
        BINSEG_SPLITS)

    daily = _daily_counts(sf_dir)
    xs = [n for _, n in daily]
    n = len(xs)
    cum = [0]
    for x in xs:
        cum.append(cum[-1] + x)
    bounds = [0, n]
    expect = []
    for _ in range(BINSEG_SPLITS):
        bs = sorted(bounds)
        best = None
        for lo, hi in zip(bs, bs[1:]):
            s, e = lo + 1, hi
            for k in range(s, e):
                a = ((cum[k] - cum[lo]) * (e - k)
                     - (cum[e] - cum[k]) * (k - s + 1))
                gain = _half_away(float(a) * a * 1_000_000.0
                                  / (float(k - s + 1) * (e - k)
                                     * (e - s + 1)))
                if best is None or (gain, -k) > (best[0], -best[1]):
                    best = (gain, k, s, e)
        gain, k, s, e = best
        expect.append((daily[k - 1][0], k, s, e, k - s + 1, e - k,
                       cum[k] - cum[s - 1], cum[e] - cum[k], gain))
        bounds.append(k)
    got = sorted(_rows("binseg_changepoints", spark, sf_dir),
                 key=lambda r: r["round"])
    assert [(r["split_day"], r["k"], r["seg_start"], r["seg_end"],
             r["n_left"], r["n_right"], r["sum_left"], r["sum_right"],
             r["gain_micro"]) for r in got] == expect


# ---------------------------------------------------------------- X276
def test_ipf_replay_and_margin_fit(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.sampling import (
        IPF_ROUNDS, IPF_SEED_YEAR, IPF_TARGET_YEAR)

    def cells(year):
        return {(p, f): c for p, f, c in duckdb.sql(f"""
            SELECT o.o_orderpriority, l.l_returnflag, COUNT(*)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o
                 ON o.o_orderkey = l.l_orderkey
            WHERE EXTRACT(year FROM l.l_shipdate) = {year}
            GROUP BY 1, 2""").fetchall()}

    seed, tgt = cells(IPF_SEED_YEAR), cells(IPF_TARGET_YEAR)
    rows_ = sorted({k[0] for k in seed})
    cols_ = sorted({k[1] for k in seed})
    row_t = {p: sum(tgt.get((p, f), 0) for f in cols_) * 1_000_000
             for p in rows_}
    col_t = {f: sum(tgt.get((p, f), 0) for p in rows_) * 1_000_000
             for f in cols_}
    w = {k: v * 1_000_000 for k, v in seed.items()}
    expect = {}
    for r in range(1, IPF_ROUNDS + 1):
        rs = {p: sum(w[(p, f)] for f in cols_ if (p, f) in w)
              for p in rows_}
        w = {k: _half_away(float(v) * row_t[k[0]] / rs[k[0]])
             for k, v in w.items()}
        cs = {f: sum(w[(p, f)] for p in rows_ if (p, f) in w)
              for f in cols_}
        w = {k: _half_away(float(v) * col_t[k[1]] / cs[k[1]])
             for k, v in w.items()}
        expect[r] = dict(w)
    got = _rows("ipf_raking_weights", spark, sf_dir)
    assert len(got) == IPF_ROUNDS * len(seed)
    for r in got:
        assert r["w_micro"] == expect[r["round"]][
            (r["priority"], r["flag"])]
        assert r["seed_n"] == seed[(r["priority"], r["flag"])]
    # column margins match the target EXACTLY in relative terms after
    # each round's column step, up to snapping (<= #rows nano each)
    final = expect[IPF_ROUNDS]
    for f in cols_:
        got_c = sum(final[(p, f)] for p in rows_ if (p, f) in final)
        assert abs(got_c - col_t[f]) <= len(rows_)


# ---------------------------------------------------------------- X277
def test_coloring_replay_and_properness(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.graph import (COLOR_MOD,
                                                         COLOR_ROUNDS)

    edges = duckdb.sql(f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                    FROM '{sf_dir}/lineitem.parquet'
                    WHERE l_partkey % {COLOR_MOD} = 0)
        SELECT DISTINCT a.i, b.i FROM op a
        JOIN op b ON a.g = b.g AND a.i < b.i""").fetchall()
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def pr(node):
        return int(hashlib.md5(
            f"col:{node}".encode()).hexdigest()[:15], 16)

    color = {u: None for u in adj}
    for r in range(1, COLOR_ROUNDS + 1):
        winners = [u for u in adj if color[u] is None
                   and all(color[v] is not None
                           or (pr(v), v) < (pr(u), u)
                           for v in adj[u])]
        for u in winners:
            used = {color[v] for v in adj[u] if color[v] is not None}
            color[u] = min(c for c in range(r) if c not in used)
    hist: dict = {}
    for u, c in color.items():
        key = -1 if c is None else c
        e = hist.setdefault(key, [0, u, u])
        e[0] += 1
        e[1] = min(e[1], u)
        e[2] = max(e[2], u)
    got = {r["color"]: (r["n_nodes"], r["min_node"], r["max_node"])
           for r in _rows("greedy_graph_coloring", spark, sf_dir)}
    assert got == {k: tuple(v) for k, v in hist.items()}
    # properness: no monochromatic edge among colored nodes
    for u, v in edges:
        if color[u] is not None and color[v] is not None:
            assert color[u] != color[v]
