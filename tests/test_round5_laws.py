"""Property laws for the round-5 operator classes (X205+): each
query's oracle pins exact values; these pin the ALGEBRA the values
must satisfy via independent pure-Python replays, so a future rewrite
can't drift into plausibly-wrong output."""

from __future__ import annotations

import duckdb

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def _copurchase_edges(sf_dir):
    """Symmetric directed co-purchase edge list, pure DuckDB."""
    return duckdb.sql(f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.i AS src, b.i AS dst
        FROM op a JOIN op b ON a.g = b.g AND a.i <> b.i""").fetchall()


def _python_louvain(edges, rounds):
    """Independent replay of the synchronous integer-gain Louvain."""
    from collections import defaultdict
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    deg = {n: len(v) for n, v in adj.items()}
    m2 = len(edges)
    c = {n: n for n in adj}
    for _ in range(rounds):
        tot = defaultdict(int)
        for n in adj:
            tot[c[n]] += deg[n]
        new_c = {}
        for n in adj:
            kic = defaultdict(int)
            for nb in adj[n]:
                kic[c[nb]] += 1
            kio = kic.get(c[n], 0)
            best, best_gain = None, 0
            for cand in sorted(kic):
                if cand == c[n]:
                    continue
                gain = (m2 * (kic[cand] - kio)
                        - deg[n] * (tot[cand] - (tot[c[n]] - deg[n])))
                if gain > best_gain or (gain == best_gain and gain > 0
                                        and (best is None or cand < best)):
                    best, best_gain = cand, gain
            new_c[n] = best if best_gain > 0 and best is not None else c[n]
        c = new_c
    return c, deg, m2


def test_louvain_matches_python_replay(spark, sf_dir):
    """X205: the Spark community summary equals an independent Python
    replay of the synchronous integer-gain Louvain, community by
    community (sizes, internal edges, degree mass, q_num)."""
    from collections import defaultdict
    edges = _copurchase_edges(sf_dir)
    from etl_airflow_spotify_spark.queries.graph import LOUVAIN_ROUNDS
    c, deg, m2 = _python_louvain(edges, LOUVAIN_ROUNDS)
    size = defaultdict(int)
    tot = defaultdict(int)
    in2 = defaultdict(int)
    for n in c:
        size[c[n]] += 1
        tot[c[n]] += deg[n]
    for s, d in edges:
        if c[s] == c[d]:
            in2[c[s]] += 1
    rows = _rows("louvain_phase1_communities", spark, sf_dir)
    got = {r["community"]: (r["n_nodes"], r["in2"], r["tot"], r["q_num"])
           for r in rows}
    want = {cc: (size[cc], in2.get(cc, 0), tot[cc],
                 m2 * in2.get(cc, 0) - tot[cc] * tot[cc])
            for cc in size}
    assert got == want


def test_louvain_communities_partition_and_conserve(spark, sf_dir):
    """X205 conservation laws: community sizes sum to |V|, internal
    directed edges sum to <= 2m, degree mass sums to exactly 2m."""
    rows = _rows("louvain_phase1_communities", spark, sf_dir)
    edges = _copurchase_edges(sf_dir)
    nodes = {s for s, _ in edges}
    m2 = len(edges)
    assert sum(r["n_nodes"] for r in rows) == len(nodes)
    assert sum(r["tot"] for r in rows) == m2
    assert 0 <= sum(r["in2"] for r in rows) <= m2
    # modularity numerator of the found partition beats (or ties) the
    # all-singletons baseline sum(-k_v^2): phase 1 only makes gain>0
    # moves in round 1 from singletons, and q_num is what gains add to
    from collections import defaultdict
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    singleton_q = sum(-k * k for k in deg.values())
    assert sum(r["q_num"] for r in rows) >= singleton_q


def test_wl_refinement_is_monotone_and_exact(spark, sf_dir):
    """X206 laws: (1) WL partitions only refine — n_classes is
    non-decreasing over rounds, max_class non-increasing; (2) round 0
    equals the degree histogram; (3) class counts conserve |V|;
    (4) full pure-Python replay of the hash-sum refinement matches."""
    import hashlib
    from collections import Counter, defaultdict

    rows = sorted(_rows("weisfeiler_lehman_profile", spark, sf_dir),
                  key=lambda r: r["round"])
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    n_nodes = len(adj)
    for r in rows:
        assert r["n_classes"] + r["max_class"] <= n_nodes + 1
    for a, b in zip(rows, rows[1:]):
        assert b["n_classes"] >= a["n_classes"]
        assert b["max_class"] <= a["max_class"]
        assert b["n_singletons"] >= a["n_singletons"]

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    lab = {n: md5hex(f"wl0:{len(adj[n])}") for n in adj}
    replay = []
    from etl_airflow_spotify_spark.queries.graph import WL_ROUNDS
    for rnd in range(WL_ROUNDS + 1):
        cnt = Counter(lab.values())
        replay.append((rnd, len(cnt), max(cnt.values()),
                       sum(1 for v in cnt.values() if v == 1)))
        if rnd == WL_ROUNDS:
            break
        h9 = {n: int(md5hex(v)[:15], 16) % 1000000000
              for n, v in lab.items()}
        lab = {n: md5hex(f"{lab[n]}:{sum(h9[x] for x in adj[n])}"
                         f":{len(adj[n])}")
               for n in adj}
    got = [(r["round"], r["n_classes"], r["max_class"],
            r["n_singletons"]) for r in rows]
    assert got == replay


def test_power_iteration_matches_python_replay(spark, sf_dir):
    """X207: exact replay of the integer-snapped power iteration, and
    the invariant that the returned top-k are true argmax nodes."""
    from collections import defaultdict
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    from etl_airflow_spotify_spark.queries.graph import (
        POWER_ITERS, POWER_SCALE, POWER_TOPK)
    x = {n: POWER_SCALE for n in adj}
    for _ in range(POWER_ITERS):
        y = {n: sum(x[v] for v in adj[n]) for n in adj}
        mx = max(y.values())
        x = {n: (yv * POWER_SCALE) // mx for n, yv in y.items()}
    want = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:POWER_TOPK]
    rows = _rows("power_iteration_hubs", spark, sf_dir)
    got = [(r["node"], r["score"]) for r in rows]
    assert got == want
    assert got[0][1] == POWER_SCALE  # argmax node snaps to the scale


def test_viterbi_matches_python_dp(spark, sf_dir):
    """X208: full Viterbi DP replay (including best-path argmax over
    both end states) in pure Python over DuckDB-fetched sequences."""
    from etl_airflow_spotify_spark.queries.events_ops import (
        _HMM_EMIT, _HMM_STAY, _HMM_SWITCH, _l2micro)
    seqs = duckdb.sql(f"""
        SELECT user_id, list(event_type ORDER BY ts, event_id)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id""").fetchall()
    stay, sw = _l2micro(_HMM_STAY), _l2micro(_HMM_SWITCH)
    want = {}
    for uid, evs in seqs:
        e = [(_l2micro(_HMM_EMIT[t][0]), _l2micro(_HMM_EMIT[t][1]))
             for t in evs]
        v0, v1 = e[0]
        for x0, x1 in e[1:]:
            v0, v1 = (x0 + max(v0 + stay, v1 + sw),
                      x1 + max(v0 + sw, v1 + stay))
        want[uid] = (len(evs), max(v0, v1), 1 if v1 > v0 else 0)
    rows = _rows("viterbi_state_decode", spark, sf_dir)
    got = {r["user_id"]: (r["n_events"], r["viterbi_micro"],
                          r["end_state"]) for r in rows}
    assert got == want
    # Viterbi dominance: score <= per-step max emission sum + 0 trans
    for uid, evs in seqs:
        ub = sum(max(_l2micro(_HMM_EMIT[t][0]), _l2micro(_HMM_EMIT[t][1]))
                 for t in evs)
        assert got[uid][1] <= ub


def test_holt_matches_python_recurrence(spark, sf_dir):
    """X209: exact Python replay of the integer Holt recurrence, plus
    the telescoping law err_t = x_t - forecast_t."""
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) * 1000000 AS xm
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()

    def fdiv(a, d):
        return (a - ((a % d) + d) % d) // d

    l, b = daily[0][1], 0
    want = []
    for day, x in daily[1:]:
        err = x - (l + b)
        l2 = fdiv(x + l + b, 2)
        b2 = fdiv(l2 - l + 3 * b, 4)
        want.append((day, x // 1000000, l2, b2, err))
        l, b = l2, b2
    rows = sorted(_rows("holt_linear_daily", spark, sf_dir),
                  key=lambda r: r["day"])
    got = [(r["day"], r["n"], r["level_micro"], r["trend_micro"],
            r["err_micro"]) for r in rows]
    assert got == want


def _daily_counts(sf_dir):
    return duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()


def test_sax_words_conserve_and_replay(spark, sf_dir):
    """X210: word occurrences sum to n_segments - 2; full Python
    replay of PAA + rank-quartile symbols + sliding words."""
    from collections import Counter
    from etl_airflow_spotify_spark.queries.events_ops import (
        SAX_SEG_DAYS, SAX_WORD)
    daily = _daily_counts(sf_dir)
    segs = []
    for s in range(len(daily) // SAX_SEG_DAYS):
        chunk = daily[s * SAX_SEG_DAYS:(s + 1) * SAX_SEG_DAYS]
        segs.append((s, sum(c for _, c in chunk), chunk[0][0]))
    order = sorted(segs, key=lambda t: (t[1], t[0]))
    sym = {}
    for rank, (s, v, d) in enumerate(order):
        sym[s] = (rank * 4) // len(segs)
    words = Counter()
    first = {}
    for s in range(len(segs) - SAX_WORD + 1):
        w = "".join(chr(97 + sym[s + k]) for k in range(SAX_WORD))
        words[w] += 1
        first.setdefault(w, (segs[s][2], s))
    rows = _rows("sax_daily_words", spark, sf_dir)
    got = {r["word"]: (r["n_occurrences"], r["first_seg_start"],
                       r["first_seg"]) for r in rows}
    want = {w: (c, first[w][0], first[w][1]) for w, c in words.items()}
    assert got == want
    assert sum(words.values()) == len(segs) - SAX_WORD + 1


def test_matrix_profile_matches_python(spark, sf_dir):
    """X211: brute-force Python matrix profile (exact integer SED,
    same exclusion zone and tie-break) matches."""
    from etl_airflow_spotify_spark.queries.events_ops import MP_W
    daily = _daily_counts(sf_dir)
    xs = [c for _, c in daily]
    nw = len(xs) - MP_W + 1
    want = {}
    for i in range(1, nw + 1):
        best = None
        for j in range(1, nw + 1):
            if abs(i - j) < MP_W:
                continue
            d2 = sum((xs[i - 1 + k] - xs[j - 1 + k]) ** 2
                     for k in range(MP_W))
            if best is None or (d2, j) < best:
                best = (d2, j)
        want[i] = (daily[i - 1][0], best[1], best[0])
    rows = _rows("matrix_profile_daily", spark, sf_dir)
    got = {r["window_i"]: (r["start_day"], r["nn_j"], r["sed"])
           for r in rows}
    assert got == want
    # symmetry law: if j is i's NN with distance d, then profile(j)<=d
    for i, (_, j, d) in got.items():
        assert got[j][2] <= d


def test_encoding_audit_matches_python(spark, sf_dir):
    """X212: exact Python replay of per-column ndv / row-group-local
    runs / bit widths, plus the width laws dict_bits <= range_bits
    implies dictionary never loses to plain-range, and
    ceil_log2 exactness at power-of-two boundaries."""
    from etl_airflow_spotify_spark.queries.scale import (
        _ENC_COLS, ENC_RG_DIV)
    rows = {r["col"]: r for r in _rows("encoding_efficiency_audit",
                                       spark, sf_dir)}
    data = duckdb.sql(f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS sd
        FROM '{sf_dir}/lineitem.parquet'
        ORDER BY l_orderkey, l_linenumber""").fetchall()

    def cl2(n):
        return 0 if n <= 1 else (n - 1).bit_length()

    cols = {"l_orderkey": 0, "l_linenumber": 1, "l_partkey": 2,
            "l_suppkey": 3, "l_quantity": 4, "ship_day": 5}
    for name, i in cols.items():
        vals = [(r[0] // ENC_RG_DIV, r[0], r[1], r[i]) for r in data]
        vals.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        runs, prev_rg, prev = 0, None, None
        max_d = 0
        for rg, ok, ln, v in vals:
            if rg != prev_rg or v != prev:
                runs += 1
            if rg == prev_rg:
                max_d = max(max_d, abs(v - prev))
            prev_rg, prev = rg, v
        got = rows[name]
        uniq = {v for *_, v in vals}
        assert got["n"] == len(vals)
        assert got["ndv"] == len(uniq)
        assert got["n_runs"] == runs
        assert got["dict_bits"] == cl2(len(uniq))
        assert got["range_bits"] == cl2(max(uniq) - min(uniq) + 1)
        assert got["delta_bits"] == cl2(max_d + 1) + 1
        assert got["dict_bits"] <= got["range_bits"]
    assert set(rows) == {n for n, _ in _ENC_COLS}


def test_cox_score_matches_python(spark, sf_dir):
    """X213: pure-Python replay of the Breslow score/information with
    the identical micro snapping, from raw events."""
    rows = _rows("cox_score_click_hazard", spark, sf_dir)
    assert len(rows) == 1
    r = rows[0]
    raw = duckdb.sql(f"""
        WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
                   FROM '{sf_dir}/events.parquet'
                   WHERE event_type = 'signup' GROUP BY user_id),
        p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
              FROM '{sf_dir}/events.parquet' e
              JOIN s ON e.user_id = s.user_id
                    AND epoch_us(e.ts) > s.s_us
              WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        c AS (SELECT user_id, COUNT(*) AS x
              FROM '{sf_dir}/events.parquet'
              WHERE event_type = 'click' GROUP BY user_id),
        h AS (SELECT MAX(epoch_us(ts)) AS h_us
              FROM '{sf_dir}/events.parquet')
        SELECT s.user_id, s.s_us, p.p_us, COALESCE(c.x, 0), h.h_us
        FROM s LEFT JOIN p USING (user_id)
        LEFT JOIN c USING (user_id) CROSS JOIN h""").fetchall()
    durs = []
    for _, s_us, p_us, x, h_us in raw:
        t = ((p_us if p_us is not None else h_us) - s_us) // 3600000000
        durs.append((t, 1 if p_us is not None else 0, x))
    assert r["n_users"] == len(durs)
    assert r["n_events"] == sum(e for _, e, _ in durs)
    u = i = 0
    for t in sorted({t for t, e, _ in durs if e}):
        risk = [x for tt, _, x in durs if tt >= t]
        evs = [x for tt, e, x in durs if tt == t and e]
        n, s1, s2 = len(risk), sum(risk), sum(v * v for v in risk)
        u += sum(evs) * 1000000 - len(evs) * ((s1 * 1000000) // n)
        i += len(evs) * ((1000000 * (n * s2 - s1 * s1)) // (n * n))
    assert r["score_micro"] == u
    assert r["info_micro"] == i
    assert r["info_micro"] >= 0  # information is a variance sum
    assert r["z2"] >= 0


def test_lof_matches_python_bruteforce(spark, sf_dir):
    """X214: brute-force Python LOF with the identical censored
    k-distance, +1 reach guard and micro snapping; plus the density
    law that a uniform-density point's LOF stays near 1e6."""
    from etl_airflow_spotify_spark.queries.ml import (
        DBSCAN_Y_DIV, LOF_EPS2, LOF_K, LOF_TOPK)
    pts = duckdb.sql(f"""
        SELECT o_custkey, COUNT(*),
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) // {DBSCAN_Y_DIV}
        FROM '{sf_dir}/orders.parquet' GROUP BY 1""").fetchall()
    nbrs = {}
    for i, (ida, xa, ya) in enumerate(pts):
        ns = []
        for idb, xb, yb in pts:
            if idb == ida:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= LOF_EPS2:
                ns.append((d2, idb))
        ns.sort()
        nbrs[ida] = ns
    kd2 = {i: (ns[LOF_K - 1][0] if len(ns) >= LOF_K else LOF_EPS2 + 1)
           for i, ns in nbrs.items()}
    lrd = {}
    for i, ns in nbrs.items():
        top = ns[:LOF_K]
        if not top:
            continue
        s = sum(max(kd2[b], d2) + 1 for d2, b in top)
        lrd[i] = (len(top) * 10 ** 12) // s
    want = {}
    for i, ns in nbrs.items():
        if len(ns) < LOF_K:
            continue
        top = ns[:LOF_K]
        want[i] = (len(ns), lrd[i],
                   (sum(lrd[b] for _, b in top) * 10 ** 6)
                   // (LOF_K * lrd[i]))
    top20 = sorted(want.items(), key=lambda kv: (-kv[1][2], kv[0]))
    top20 = [(i, *v) for i, v in top20[:LOF_TOPK]]
    rows = _rows("lof_rfm_outliers", spark, sf_dir)
    got = [(r["id"], r["n_nb"], r["lrd_micro"], r["lof_micro"])
           for r in rows]
    assert got == top20


def test_textrank_matches_python_pagerank(spark, sf_dir):
    """X215: Python replay of the integer PageRank over the
    independently-rebuilt word co-occurrence graph."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.operators.graph import DAMP_NUM, SCALE
    from etl_airflow_spotify_spark.queries.text import (
        TEXTRANK_ITERS, TEXTRANK_MIN_COUNT, TEXTRANK_TOPK)
    toks = duckdb.sql(f"""
        WITH d AS (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS t
                   FROM '{sf_dir}/documents.parquet')
        SELECT doc_id, unnest(range(1, len(t) + 1)), unnest(t)
        FROM d""").fetchall()
    from collections import Counter
    cnt = Counter(w for _, _, w in toks)
    vocab = {w for w, c in cnt.items() if c >= TEXTRANK_MIN_COUNT}
    bydoc = defaultdict(dict)
    for doc, pos, w in toks:
        bydoc[doc][pos] = w
    edges = set()
    for doc, posw in bydoc.items():
        for pos, w in posw.items():
            for off in (-2, -1, 1, 2):
                w2 = posw.get(pos + off)
                if (w2 is not None and w2 != w
                        and w in vocab and w2 in vocab):
                    edges.add((w, w2))
    adj = defaultdict(list)
    for s, dd in edges:
        adj[s].append(dd)
    deg = {w: len(v) for w, v in adj.items()}
    n = len(deg)
    pr = {w: SCALE // n for w in deg}
    tele = (15 * SCALE) // (100 * n)
    for _ in range(TEXTRANK_ITERS):
        nxt = defaultdict(int)
        for s, ds in adj.items():
            c = pr[s] // deg[s]
            for dd in ds:
                nxt[dd] += c
        pr = {w: tele + (DAMP_NUM * v) // 100 for w, v in nxt.items()}
    want = sorted(((w, p, deg[w]) for w, p in pr.items()),
                  key=lambda t: (-t[1], t[0]))[:TEXTRANK_TOPK]
    rows = _rows("textrank_keywords", spark, sf_dir)
    got = [(r["word"], r["pr"], r["degree"]) for r in rows]
    assert got == want


def test_dtw_matches_python_and_bounds(spark, sf_dir):
    """X216 laws: full-matrix Python DP (same band) matches, DTW is
    symmetric in the pair orientation, DTW(a,a) = 0, and banded DTW
    >= unbanded DTW (band only restricts the warping path)."""
    from etl_airflow_spotify_spark.queries.events_ops import DTW_BAND
    series = duckdb.sql(f"""
        WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts)
                       AS DATE) AS day, COUNT(*) AS n
                       FROM '{sf_dir}/events.parquet' GROUP BY 1, 2),
        days AS (SELECT DISTINCT day FROM daily),
        types AS (SELECT DISTINCT event_type AS et FROM daily)
        SELECT t.et, d.day, COALESCE(x.n, 0)
        FROM types t CROSS JOIN days d
        LEFT JOIN daily x ON x.event_type = t.et AND x.day = d.day
        ORDER BY t.et, d.day""").fetchall()
    from collections import defaultdict
    ser = defaultdict(list)
    for et, _, n in series:
        ser[et].append(n)

    def dtw(x, y, band):
        n = len(x)
        inf = 1 << 50
        dm = [[inf] * (n + 1) for _ in range(n + 1)]
        dm[0][0] = 0
        for i in range(1, n + 1):
            for j in range(max(1, i - band), min(n, i + band) + 1):
                c = (x[i - 1] - y[j - 1]) ** 2
                dm[i][j] = c + min(dm[i - 1][j], dm[i][j - 1],
                                   dm[i - 1][j - 1])
        return dm[n][n]

    rows = _rows("dtw_event_type_distance", spark, sf_dir)
    ets = sorted(ser)
    assert {(r["ta"], r["tb"]) for r in rows} \
        == {(a, b) for a in ets for b in ets if a < b}
    for r in rows:
        x, y = ser[r["ta"]], ser[r["tb"]]
        assert r["n_days"] == len(x)
        assert r["dtw"] == dtw(x, y, DTW_BAND)
        assert r["dtw"] == dtw(y, x, DTW_BAND)       # symmetry
        assert r["dtw"] >= dtw(x, y, len(x))          # band >= unbanded
        assert dtw(x, x, DTW_BAND) == 0


def test_hhh_matches_python(spark, sf_dir):
    """X217: Python replay of conditioned hierarchical heavy hitters
    over day -> month -> year, plus the threshold law that every
    emitted residual clears theta."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.relational import HHH_DIV
    days = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE),
               CAST(date_trunc('month', o_orderdate) AS DATE),
               CAST(date_trunc('year', o_orderdate) AS DATE), COUNT(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2, 3""").fetchall()
    total = sum(c for *_, c in days)
    theta = total // HHH_DIV
    hd = {d: c for d, m, y, c in days if c >= theta}
    mon = defaultdict(lambda: [0, 0])  # c, claimed
    for d, m, y, c in days:
        mon[(m, y)][0] += c
        if d in hd:
            mon[(m, y)][1] += c
    hm = {m: (c, c - cl) for (m, y), (c, cl) in mon.items()
          if c - cl >= theta}
    yr = defaultdict(lambda: [0, 0, 0])  # c, claimed_m, claimed_d
    for (m, y), (c, cl) in mon.items():
        yr[y][0] += c
        if m in hm:
            yr[y][1] += hm[m][0]
        else:
            yr[y][2] += cl
    hy = {y: (c, c - cm - cd) for y, (c, cm, cd) in yr.items()
          if c - cm - cd >= theta}
    want = ({("day", str(d), c, c) for d, c in hd.items()}
            | {("month", str(m), c, r) for m, (c, r) in hm.items()}
            | {("year", str(y), c, r) for y, (c, r) in hy.items()})
    rows = _rows("hierarchical_heavy_hitters", spark, sf_dir)
    got = {(r["level"], r["key"], r["c"], r["residual"]) for r in rows}
    assert got == want
    for _, _, _, res in got:
        assert res >= theta


def test_theil_matches_python_and_decomposes(spark, sf_dir):
    """X218: Python replay on the same micro-bit grid, plus the exact
    float-side decomposition identity T ~ T_between + sum share*T_g
    (checked in true floats within micro-grid tolerance)."""
    import math
    from collections import defaultdict
    cust = duckdb.sql(f"""
        SELECT o.o_custkey, MIN(c.c_nationkey),
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_custkey HAVING SUM(o.o_totalprice) > 0""").fetchall()
    names = dict(duckdb.sql(
        f"SELECT n_nationkey, n_name FROM '{sf_dir}/nation.parquet'")
        .fetchall())

    def l2m(v):
        return round(math.log2(v) * 1000000)

    def fdiv(a, d):
        return (a - ((a % d) + d) % d) // d

    groups = defaultdict(list)
    for _, nk, x in cust:
        groups[names[nk]].append(x)
    N = sum(len(v) for v in groups.values())
    X = sum(sum(v) for v in groups.values())
    want = {}
    for nat, xs in groups.items():
        xg, ng_n = sum(xs), len(xs)
        ngr = (sum(x * l2m(x) for x in xs)
               - xg * (l2m(xg) - l2m(ng_n)))
        bt = xg * (l2m(xg) - l2m(ng_n) - l2m(X) + l2m(N))
        want[nat] = (ng_n, xg, fdiv(ngr, xg), fdiv(bt, X))
    rows = _rows("theil_nation_decomposition", spark, sf_dir)
    got = {r["nation"]: (r["n_customers"], r["revenue_cents"],
                         r["theil_within_micro"],
                         r["between_term_micro"]) for r in rows}
    assert got == want
    # decomposition identity in true floats (micro grid ~1e-5 slack)
    mu = X / N
    t_total = sum(x / X * math.log2(x / mu)
                  for xs in groups.values() for x in xs)
    t_b = sum(r[1] / X * r[2] / 1e6 for r in got.values())  # within part
    t_between = sum(r[3] / 1e6 for r in got.values())
    assert abs(t_total - (t_b + t_between)) < 1e-3


def test_lsh_planner_scurve_laws(spark, sf_dir):
    """X219 laws: the snapped S-curve replays exactly in Python; for a
    fixed signature budget, more rows per band => a SHARPER curve
    (lower p at s=0.5 once r > 1); est_caught <= n_candidates; and
    the (b=16, r=1) config catches the most (p is monotone in b at
    fixed r=1)."""
    from etl_airflow_spotify_spark.queries.dedup import LSHP_CONFIGS

    def pow_snap(x, e):
        p = x
        for _ in range(e - 1):
            p = (p * x) // 1000000
        return p

    def curve(s_micro, b, r):
        return 1000000 - pow_snap(1000000 - pow_snap(s_micro, r), b)

    rows = {(r["bands"], r["rows_per_band"]): r
            for r in _rows("lsh_parameter_planner", spark, sf_dir)}
    assert set(rows) == set(LSHP_CONFIGS)
    for (b, r), row in rows.items():
        assert row["p50_micro"] == curve(500000, b, r)
        assert row["p75_micro"] == curve(750000, b, r)
        assert 0 <= row["est_caught"] <= row["n_candidates"]
    p50s = [rows[c]["p50_micro"] for c in LSHP_CONFIGS]
    assert p50s == sorted(p50s, reverse=True)  # more rows => sharper
    assert rows[(16, 1)]["est_caught"] == max(
        r["est_caught"] for r in rows.values())


def test_iforest_matches_python_forest(spark, sf_dir):
    """X220: full Python replay of the md5-split forest (same axis/
    split channel, same leaf rules), plus depth bounds."""
    import hashlib
    from etl_airflow_spotify_spark.queries.ml import (
        DBSCAN_Y_DIV, IFOREST_DEPTH, IFOREST_TOPK, IFOREST_TREES)
    pts = duckdb.sql(f"""
        SELECT o_custkey, COUNT(*),
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) // {DBSCAN_Y_DIV}
        FROM '{sf_dir}/orders.parquet' GROUP BY 1""").fetchall()

    def h60(tag, tree, node):
        s = f"{tag}:{tree}:{node}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    depth_sum = {pid: 0 for pid, _, _ in pts}
    for tree in range(IFOREST_TREES):
        groups = {1: [(pid, x, y) for pid, x, y in pts]}
        for level in range(IFOREST_DEPTH):
            nxt = {}
            for node, members in groups.items():
                xs = [x for _, x, _ in members]
                ys = [y for _, _, y in members]
                axis = h60("ax", tree, node) % 2
                ok = len(members) > 1 and (
                    (axis == 0 and max(xs) > min(xs))
                    or (axis == 1 and max(ys) > min(ys)))
                if not ok:
                    for pid, _, _ in members:
                        depth_sum[pid] += level
                    continue
                vals = xs if axis == 0 else ys
                lo, hi = min(vals), max(vals)
                s = lo + h60("sp", tree, node) % (hi - lo)
                left = [m for m in members
                        if (m[1] if axis == 0 else m[2]) <= s]
                right = [m for m in members
                         if (m[1] if axis == 0 else m[2]) > s]
                nxt[2 * node] = left
                nxt[2 * node + 1] = right
            groups = nxt
        for members in groups.values():
            for pid, _, _ in members:
                depth_sum[pid] += IFOREST_DEPTH
    want = sorted(
        ((pid, ds, ds * 1000000 // IFOREST_TREES)
         for pid, ds in depth_sum.items()),
        key=lambda t: (t[2], t[0]))[:IFOREST_TOPK]
    rows = _rows("iforest_rfm_outliers", spark, sf_dir)
    got = [(r["id"], r["depth_sum"], r["mean_depth_micro"])
           for r in rows]
    assert got == want
    for _, ds, _ in got:
        assert 0 <= ds <= IFOREST_TREES * IFOREST_DEPTH


def test_voptimal_matches_python_dp(spark, sf_dir):
    """X221: exact Python DP replay (same micro SSE, same smallest-
    split tie-break), plus optimality: the returned partition's total
    cost equals the DP optimum, buckets tile 1..n."""
    from etl_airflow_spotify_spark.queries.events_ops import VOPT_B
    daily = _daily_counts(sf_dir)
    xs = [c for _, c in daily]
    n = len(xs)

    def sse(i, j):  # 1-based inclusive
        seg = xs[i - 1:j]
        m, s1, s2 = len(seg), sum(seg), sum(v * v for v in seg)
        return (1000000 * (m * s2 - s1 * s1)) // m

    INF = 1 << 62
    d = {(1, j): (sse(1, j), 0) for j in range(1, n + 1)}
    for b in range(2, VOPT_B + 1):
        for j in range(b, n + 1):
            best = (INF, -1)
            for i in range(b - 1, j):
                cand = (d[(b - 1, i)][0] + sse(i + 1, j), i)
                if cand < best:
                    best = cand
            d[(b, j)] = best
    path = []
    j = n
    for b in range(VOPT_B, 0, -1):
        arg = d[(b, j)][1]
        path.append((b, arg + 1, j))
        j = arg
    want = {(b, i, j, daily[i - 1][0], daily[j - 1][0], sse(i, j))
            for b, i, j in path}
    rows = _rows("voptimal_daily_histogram", spark, sf_dir)
    got = {(r["bucket"], r["start_idx"], r["end_idx"], r["start_day"],
            r["end_day"], r["sse_micro"]) for r in rows}
    assert got == want
    idxs = sorted((i, j) for _, i, j, *_ in got)
    assert idxs[0][0] == 1 and idxs[-1][1] == n
    for (a, bnd), (c, _) in zip(idxs, idxs[1:]):
        assert c == bnd + 1  # buckets tile the series
    assert sum(r["sse_micro"] for r in rows) == d[(VOPT_B, n)][0]


def test_dr_ope_matches_python_and_identities(spark, sf_dir):
    """X222: Python replay of the DR estimator with the identical md5
    channel and micro-snapped Q-hat; DR identity law: for the
    'play_own_type' policy, matched corrections use the policy's own
    Q-hat cells."""
    import hashlib
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import OPE_ARMS
    ev = duckdb.sql(f"""
        SELECT event_id, event_type, value
        FROM '{sf_dir}/events.parquet'""").fetchall()
    types = sorted({t for _, t, _ in ev})
    tix = {t: i for i, t in enumerate(types)}
    a_purch = tix["purchase"]

    def h(salt, eid):
        return int(hashlib.md5(f"{salt}{eid}".encode())
                   .hexdigest()[:15], 16)

    logged = []
    for eid, et, v in ev:
        own = tix[et]
        vm = round(v * 1000000)
        a_log = h("log:", eid) % OPE_ARMS
        a_rand = h("tgt:", eid) % OPE_ARMS
        r = vm if a_log == own else 0
        logged.append((own, vm, a_log, a_rand, r))
    qs = defaultdict(lambda: [0, 0])
    for own, vm, a_log, _, r in logged:
        qs[(own, a_log)][0] += r
        qs[(own, a_log)][1] += 1
    qhat = {k: s // c for k, (s, c) in qs.items()}
    want = {}
    for policy in ("always_purchase", "play_own_type", "uniform_md5"):
        sq = sdr = st = 0
        for own, vm, a_log, a_rand, r in logged:
            a_pi = {"always_purchase": a_purch, "play_own_type": own,
                    "uniform_md5": a_rand}[policy]
            qp = qhat.get((own, a_pi), 0)
            corr = (OPE_ARMS * (r - qhat.get((own, a_log), 0))
                    if a_pi == a_log else 0)
            sq += qp
            sdr += qp + corr
            st += vm if a_pi == own else 0
        n = len(logged)
        want[policy] = (n, round(sq / n / 1e6, 6),
                        round(sdr / n / 1e6, 6), round(st / n / 1e6, 6))
    rows = _rows("offpolicy_dr_eval", spark, sf_dir)
    got = {r["policy"]: (r["n_logs"], r["dm_value"], r["dr_value"],
                         r["true_value"]) for r in rows}
    assert got == want


def test_phash_plants_and_invariance(spark, sf_dir):
    """X223 laws: every planted x2-contrast copy surfaces at hamming 0
    (pHash bits are exactly contrast-invariant: coefficients are
    linear in pixels, the median threshold scales along); Python
    replay of the hash for a sample of docs."""
    from etl_airflow_spotify_spark.operators.multimodal import PHASH_DCT
    from etl_airflow_spotify_spark.queries.multimodal import (
        PHASH_N_PLANT, PHASH_PLANT_OFFSET)
    rows = _rows("multimodal_phash_dedup", spark, sf_dir)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    for d in range(PHASH_N_PLANT):
        assert pairs.get((d, d + PHASH_PLANT_OFFSET)) == 0, \
            f"plant {d} not found at hamming 0"

    def phash(codes):
        L = len(codes)
        px = [0] * 64
        for i, c in enumerate(codes):
            px[(i * 64) // L] += c
        coeffs = []
        for u in range(4):
            for v in range(4):
                if u == v == 0:
                    continue
                s = sum(px[k] * PHASH_DCT[u][k % 8] * PHASH_DCT[v][k // 8]
                        for k in range(64))
                coeffs.append((s, u, v))
        theta = sorted(coeffs)[7][0]
        return sum(1 << (u * 4 + v - 1)
                   for s, u, v in coeffs if s > theta)

    docs = duckdb.sql(f"""SELECT doc_id, text
        FROM '{sf_dir}/documents.parquet'
        ORDER BY doc_id LIMIT 5""").fetchall()
    for _, text in docs:
        codes = [ord(c) for c in text]
        assert phash(codes) == phash([2 * c for c in codes])


def test_fd_discovery_matches_python_and_key_laws(spark, sf_dir):
    """X224: exact ndv replay per pair; key->attr FDs must hold;
    holds=1 iff violations=0."""
    from etl_airflow_spotify_spark.queries.maintenance import _FD_PAIRS
    rows = {(r["tbl"], r["lhs"], r["rhs"]): r
            for r in _rows("fd_discovery", spark, sf_dir)}
    assert set(rows) == set(_FD_PAIRS)
    for tbl, a, b in _FD_PAIRS:
        nl, np_ = duckdb.sql(f"""
            SELECT COUNT(DISTINCT CAST({a} AS VARCHAR)),
                   COUNT(DISTINCT CAST({a} AS VARCHAR) || '|'
                         || CAST({b} AS VARCHAR))
            FROM '{sf_dir}/{tbl}.parquet'""").fetchone()
        r = rows[(tbl, a, b)]
        assert (r["ndv_lhs"], r["ndv_pair"]) == (nl, np_)
        assert r["holds"] == (1 if nl == np_ else 0)
        assert (r["violations"] == 0) == (r["holds"] == 1)
        assert r["violations"] >= 0
    for key_pair in (("part", "p_partkey", "p_brand"),
                     ("orders", "o_orderkey", "o_custkey"),
                     ("customer", "c_custkey", "c_nationkey")):
        assert rows[key_pair]["holds"] == 1


def test_ktruss_matches_python_and_converges(spark, sf_dir):
    """X225: Python replay of the peeling rounds (true triangle counts
    per edge, same support threshold), monotone edge counts, and
    convergence check: the fixed 3 rounds reach the true 4-truss
    fixpoint on this graph."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.graph import (
        KTRUSS_K, KTRUSS_ROUNDS)
    edges = _copurchase_edges(sf_dir)
    eu = {(min(s, d), max(s, d)) for s, d in edges}

    def peel_once(es):
        adj = defaultdict(set)
        for lo, hi in es:
            adj[lo].add(hi)
            adj[hi].add(lo)
        sup = defaultdict(int)
        ntri = 0
        for lo, hi in es:
            common = adj[lo] & adj[hi]
            sup[(lo, hi)] = len(common)
            ntri += len(common)
        ntri //= 3
        kept = {e for e in es if sup[e] >= KTRUSS_K - 2}
        return kept, ntri

    want = []
    cur = eu
    for r in range(KTRUSS_ROUNDS):
        nxt, ntri = peel_once(cur)
        want.append((r + 1, len(cur), len(cur) - len(nxt), len(nxt),
                     ntri))
        cur = nxt
    rows = sorted(_rows("ktruss_peeling_profile", spark, sf_dir),
                  key=lambda r: r["round"])
    got = [(r["round"], r["edges_before"], r["edges_removed"],
            r["edges_after"], r["triangles"]) for r in rows]
    assert got == want
    # convergence: one more round removes nothing
    nxt, _ = peel_once(cur)
    assert nxt == cur
    for a, b in zip(got, got[1:]):
        assert b[1] == a[3]          # chaining
        assert b[3] <= a[3]          # monotone shrink


def test_cka_matches_python_and_bounds(spark, sf_dir):
    """X226: Python replay of the whole integer pipeline; 0 < CKA <= 1
    (Cauchy-Schwarz), and CKA(X, X) = 1 exactly."""
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.similarity import (
        CKA_LEVELS, CKA_Q, DIM)
    rows = _rows("cka_quantization_fidelity", spark, sf_dir)
    assert len(rows) == 1
    r = rows[0]
    vecs = duckdb.sql(f"""
        SELECT vec_id, CAST(embedding AS DOUBLE[])
        FROM '{sf_dir}/embeddings.parquet'""").fetchall()
    n = len(vecs)
    xq = {v: [round(val * CKA_Q) for val in emb] for v, emb in vecs}
    mn = [min(x[p] for x in xq.values()) for p in range(DIM)]
    mx = [max(x[p] for x in xq.values()) for p in range(DIM)]

    def recon(v, p):
        if mx[p] == mn[p]:
            return mn[p]
        rng = mx[p] - mn[p]
        code = ((xq[v][p] - mn[p]) * 2 * CKA_LEVELS + rng) // (2 * rng)
        return mn[p] + code * rng * 2 // (2 * CKA_LEVELS)

    yq = {v: [recon(v, p) for p in range(DIM)] for v in xq}
    sx = [sum(x[p] for x in xq.values()) for p in range(DIM)]
    sy = [sum(y[p] for y in yq.values()) for p in range(DIM)]
    zx = {v: [n * xq[v][p] - sx[p] for p in range(DIM)] for v in xq}
    zy = {v: [n * yq[v][p] - sy[p] for p in range(DIM)] for v in yq}
    fxx = fxy = fyy = 0
    for p in range(DIM):
        for q in range(DIM):
            gxx = sum(zx[v][p] * zx[v][q] for v in zx)
            gxy = sum(zx[v][p] * zy[v][q] for v in zx)
            gyy = sum(zy[v][p] * zy[v][q] for v in zx)
            fxx += gxx * gxx
            fxy += gxy * gxy
            fyy += gyy * gyy
    want = round(float(fxy) / (math.sqrt(float(fxx))
                               * math.sqrt(float(fyy))), 6)
    assert r["n_vecs"] == n and r["dim"] == DIM
    assert r["cka"] == want
    assert 0 < r["cka"] <= 1.000001


def test_nw_alignment_matches_python(spark, sf_dir):
    """X227: full-matrix Python NW replay, plus score bounds: score
    <= 4*match (perfect alignment ceiling) and score >= gap*(n+4)
    (align nothing floor)."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import (
        NW_GAP, NW_MATCH, NW_MISMATCH, NW_TEMPLATE)
    seqs = duckdb.sql(f"""
        SELECT user_id, list(event_type ORDER BY ts, event_id)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id""").fetchall()

    def nw(tokens):
        m = len(NW_TEMPLATE)
        row = [j * NW_GAP for j in range(m + 1)]
        for t in tokens:
            new = [row[0] + NW_GAP]
            for j in range(1, m + 1):
                s = NW_MATCH if t == NW_TEMPLATE[j - 1] else NW_MISMATCH
                new.append(max(row[j] + NW_GAP, new[j - 1] + NW_GAP,
                               row[j - 1] + s))
            row = new
        return row[m]

    want = {uid: (len(toks), nw(toks)) for uid, toks in seqs}
    rows = _rows("funnel_alignment_scores", spark, sf_dir)
    got = {r["user_id"]: (r["n_events"], r["align_score"])
           for r in rows}
    assert got == want
    for uid, toks in seqs:
        assert got[uid][1] <= 4 * NW_MATCH
        assert got[uid][1] >= NW_GAP * (len(toks) + 4)


def test_link_prediction_matches_python(spark, sf_dir):
    """X228: Python replay of candidates, scores and midrank AUC; plus
    CN <= min(deg) law and AUC in (0, 1)."""
    from collections import defaultdict
    import math
    li = duckdb.sql(f"""
        SELECT DISTINCT l_orderkey, l_partkey
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    by_order = defaultdict(set)
    for g, i in li:
        by_order[g].add(i)
    etr, ete = set(), set()
    for g, items in by_order.items():
        items = sorted(items)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                e = (items[x], items[y])
                (etr if g % 2 == 0 else ete).add(e)
    adj = defaultdict(set)
    for lo, hi in etr:
        adj[lo].add(hi)
        adj[hi].add(lo)
    deg = {z: len(v) for z, v in adj.items()}
    cand = defaultdict(lambda: [0, 0, 0])
    for z, ns in adj.items():
        ns = sorted(ns)
        for x in range(len(ns)):
            for y in range(x + 1, len(ns)):
                k = (ns[x], ns[y])
                cand[k][0] += 1
                cand[k][1] += 10 ** 12 // round(
                    math.log2(deg[z]) * 1000000)
                cand[k][2] += 10 ** 9 // deg[z]
    nonedge = {k: v for k, v in cand.items() if k not in etr}
    labels = {k: (1 if k in ete else 0) for k in nonedge}

    def auc(scores):
        vals = defaultdict(lambda: [0, 0])
        for k, s in scores.items():
            vals[s][labels[k]] += 1
        p = sum(v[1] for v in vals.values())
        n = sum(v[0] for v in vals.values())
        u2 = 0
        neg_below = 0
        for s in sorted(vals):
            nn, np_ = vals[s][0], vals[s][1]
            u2 += np_ * (2 * neg_below + nn)
            neg_below += nn
        return p, n, round(u2 / (2.0 * p * n), 6)

    want = {}
    for mi, m in ((0, "cn"), (1, "aa"), (2, "ra")):
        want[m] = auc({k: v[mi] for k, v in nonedge.items()})
    rows = _rows("link_prediction_eval", spark, sf_dir)
    got = {r["method"]: (r["n_pos"], r["n_neg"], r["auc"])
           for r in rows}
    assert got == want
    for k, (cn, _, _) in nonedge.items():
        assert cn <= min(deg[k[0]], deg[k[1]])
    for m in got:
        assert 0 < got[m][2] < 1.000001


def test_page_hinkley_matches_python_recurrence(spark, sf_dir):
    """X229: replay the Page-Hinkley recurrence (running mean on the
    floor-divided micro grid, cumulative U, PH = U - running min) in
    pure Python; PH is nonnegative and alarm iff PH > lambda."""
    from etl_airflow_spotify_spark.queries.events_ops import (
        PH_DELTA_MICRO, PH_LAMBDA_MICRO)
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()
    want = {}
    cs = u_up = u_dn = 0
    min_up, max_dn = None, None
    for t, (day, n) in enumerate(daily, start=1):
        cs += n
        dev = n * 1000000 - (cs * 1000000) // t
        u_up += dev - PH_DELTA_MICRO
        u_dn += dev + PH_DELTA_MICRO
        min_up = u_up if min_up is None else min(min_up, u_up)
        max_dn = u_dn if max_dn is None else max(max_dn, u_dn)
        ph_up, ph_dn = u_up - min_up, max_dn - u_dn
        alarm = 1 if (ph_up > PH_LAMBDA_MICRO
                      or ph_dn > PH_LAMBDA_MICRO) else 0
        want[day] = (n, ph_up, ph_dn, alarm)
    rows = _rows("page_hinkley_drift", spark, sf_dir)
    got = {r["day"]: (r["n"], r["ph_up_micro"], r["ph_dn_micro"],
                      r["alarm"]) for r in rows}
    assert got == want
    for day, (_, ph_up, ph_dn, _) in want.items():
        assert ph_up >= 0 and ph_dn >= 0


def test_group_split_laws(spark, sf_dir):
    """X230: grouped scenario never straddles; rows conserve per
    scenario; md5 bucket replay for a sample of users; row fractions
    sum to ~1e6 (floor-division dust only)."""
    import hashlib
    rows = _rows("group_split_assignment", spark, sf_dir)
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    by_scen = {}
    for r in rows:
        by_scen.setdefault(r["scenario"], []).append(r)
    assert set(by_scen) == {"group", "row"}
    for scen, rs in by_scen.items():
        assert sum(r["n_rows"] for r in rs) == n_events
        frac = sum(r["row_frac_micro"] for r in rs)
        assert 1000000 - len(rs) <= frac <= 1000000
        straddles = {r["n_straddle_groups"] for r in rs}
        assert len(straddles) == 1
        if scen == "group":
            assert straddles == {0}
    # md5 bucket replay: the grouped split of each user matches
    users = duckdb.sql(f"""
        SELECT user_id, COUNT(*) FROM '{sf_dir}/events.parquet'
        GROUP BY 1""").fetchall()
    want_rows = {"train": 0, "valid": 0, "test": 0}
    for uid, cnt in users:
        b = int(hashlib.md5(f"gsplit:{uid}".encode())
                .hexdigest()[:15], 16) % 10
        split = "train" if b < 8 else ("valid" if b == 8 else "test")
        want_rows[split] += cnt
    got_rows = {r["split"]: r["n_rows"] for r in by_scen["group"]}
    assert all(got_rows.get(s, 0) == n for s, n in want_rows.items()
               if n > 0)


def test_ldiversity_matches_python(spark, sf_dir):
    """X231: full Python replay of k / l / TVD per QI group; TVD
    bounded in [0, 1e6]; k sums to the join size."""
    from collections import Counter, defaultdict
    trip = duckdb.sql(f"""
        SELECT c.c_nationkey, o.o_orderpriority, o.o_orderstatus
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c
          ON o.o_custkey = c.c_custkey""").fetchall()
    n = len(trip)
    gl = Counter(s for _, _, s in trip)
    grp = defaultdict(Counter)
    for nat, pri, s in trip:
        grp[(nat, pri)][s] += 1
    want = {}
    for (nat, pri), cnt in grp.items():
        k = sum(cnt.values())
        tvd = sum(abs((cnt.get(s, 0) * 1000000) // k
                      - (gl[s] * 1000000) // n) for s in gl) // 2
        want[(nat, pri)] = (k, len(cnt), tvd)
    rows = _rows("ldiversity_tcloseness", spark, sf_dir)
    got = {(r["nation"], r["priority"]):
           (r["k_count"], r["l_distinct"], r["tvd_micro"]) for r in rows}
    assert got == want
    assert sum(v[0] for v in got.values()) == n
    for r in rows:
        assert 0 <= r["tvd_micro"] <= 1000000
        assert r["meets_l"] == (1 if r["l_distinct"] >= 2 else 0)


def test_beam_search_matches_python(spark, sf_dir):
    """X232: full Python beam-search replay over the bigram LM with
    micro-grid log2 conditionals; per-step count <= width; scores
    non-increasing within a step's ranking."""
    import math
    from collections import Counter, defaultdict
    from etl_airflow_spotify_spark.queries.text import (
        BEAM_STEPS, BEAM_WIDTH)
    texts = duckdb.sql(f"""
        SELECT string_split_regex(trim(lower(text)), '\\s+')
        FROM '{sf_dir}/documents.parquet'""").fetchall()
    bg = Counter()
    uni = Counter()
    for (toks,) in texts:
        uni.update(toks)
        for i in range(len(toks) - 1):
            bg[(toks[i], toks[i + 1])] += 1
    tot = defaultdict(int)
    for (a, b), c in bg.items():
        tot[a] += c
    lp = {(a, b): round(math.log2(c) * 1000000)
          - round(math.log2(tot[a]) * 1000000)
          for (a, b), c in bg.items()}
    succ = defaultdict(list)
    for (a, b) in bg:
        succ[a].append(b)
    seed = min(uni, key=lambda w: (-uni[w], w))
    beams = [(seed, 0, seed)]
    want = {(0, 1): (seed, 0)}
    for step in range(1, BEAM_STEPS + 1):
        cand = []
        for seq, score, last in beams:
            for b in succ.get(last, ()):
                cand.append((seq + " " + b, score + lp[(last, b)], b))
        cand.sort(key=lambda x: (-x[1], x[0]))
        beams = cand[:BEAM_WIDTH]
        for rank, (seq, score, _) in enumerate(beams, start=1):
            want[(step, rank)] = (seq, score)
        if not beams:
            break
    rows = _rows("beam_search_decode", spark, sf_dir)
    got = {(r["step"], r["rank"]): (r["seq"], r["score_micro"])
           for r in rows}
    assert got == want
    by_step = defaultdict(list)
    for (step, rank), (_, score) in got.items():
        by_step[step].append((rank, score))
    for step, rs in by_step.items():
        assert len(rs) <= BEAM_WIDTH
        scores = [s for _, s in sorted(rs)]
        assert scores == sorted(scores, reverse=True)


def test_luby_mis_laws(spark, sf_dir):
    """X233: full Python replay of the md5-priority Luby rounds;
    final selected set is independent AND maximal; graph empties
    within the fixed round budget at test scale."""
    import hashlib
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.graph import LUBY_ROUNDS
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    active = set(adj)
    mis = set()
    want = []
    for r in range(1, LUBY_ROUNDS + 1):
        pri = {v: int(hashlib.md5(f"luby:{r}:{v}".encode())
                      .hexdigest()[:15], 16) for v in active}
        sel = {v for v in active
               if all(pri[v] < pri[u] for u in adj[v] if u in active)}
        removed = {u for v in sel for u in adj[v] if u in active}
        active = active - sel - removed
        mis |= sel
        want.append((r, len(sel), sum(sel), len(active)))
    rows = _rows("luby_mis", spark, sf_dir)
    got = [(r["round"], r["n_selected"], r["sel_id_sum"],
            r["n_remaining"]) for r in sorted(rows,
                                              key=lambda x: x["round"])]
    assert got == want
    # independence: no edge inside the MIS
    for v in mis:
        assert not (adj[v] & mis)
    # the budget empties the graph at test scale -> maximality holds
    assert want[-1][3] == 0
    for v in set(adj) - mis:
        assert adj[v] & mis


def test_goodturing_matches_python(spark, sf_dir):
    """X234: Python replay of the trigram frequency-of-frequencies and
    every estimator; Chao1 >= V; Good-Turing mass of seen types plus
    p0 conserves (sum over r of r*·N_r approx N on the micro grid)."""
    from collections import Counter
    from etl_airflow_spotify_spark.queries.text import GT_MAX_R
    texts = duckdb.sql(f"""
        SELECT string_split_regex(trim(lower(text)), '\\s+')
        FROM '{sf_dir}/documents.parquet'""").fetchall()
    tc = Counter()
    for (toks,) in texts:
        for i in range(len(toks) - 2):
            tc[(toks[i], toks[i + 1], toks[i + 2])] += 1
    fof = Counter(tc.values())
    v = len(tc)
    n = sum(tc.values())
    n1, n2 = fof.get(1, 0), fof.get(2, 0)
    p0 = (n1 * 1000000) // n
    chao1 = v * 1000000 + (n1 * (n1 - 1) * 1000000) // (2 * (n2 + 1))
    want = {}
    for r, n_r in fof.items():
        if r > GT_MAX_R:
            continue
        nx = fof.get(r + 1)
        rstar = None if nx is None else ((r + 1) * nx * 1000000) // n_r
        want[r] = (n_r, rstar, v, n, p0, chao1)
    rows = _rows("goodturing_vocab", spark, sf_dir)
    got = {r["r"]: (r["n_r"], r["rstar_micro"], r["v_total"],
                    r["n_tokens"], r["p0_micro"], r["chao1_micro"])
           for r in rows}
    assert got == want
    assert chao1 >= v * 1000000
    assert 0 <= p0 <= 1000000


def test_kcenter_matches_python(spark, sf_dir):
    """X235: brute-force Python Gonzalez replay on the quantized grid;
    radius is non-increasing in k; centers are distinct."""
    vecs = duckdb.sql(f"""
        SELECT vec_id, CAST(embedding AS DOUBLE[])
        FROM '{sf_dir}/embeddings.parquet'""").fetchall()
    from etl_airflow_spotify_spark.queries.similarity import KCENTER_K
    pts = {vid: [round(x * 1000000) for x in e] for vid, e in vecs}

    def d2(a, b):
        return sum((u - v) * (u - v) for u, v in zip(a, b))

    c0 = min(pts)
    dist = {vid: d2(p, pts[c0]) for vid, p in pts.items()}
    want = [(1, c0, max(dist.values()))]
    for k in range(2, KCENTER_K + 1):
        nxt = min(pts, key=lambda vid: (-dist[vid], vid))
        for vid in pts:
            dist[vid] = min(dist[vid], d2(pts[vid], pts[nxt]))
        want.append((k, nxt, max(dist.values())))
    rows = _rows("kcenter_coreset", spark, sf_dir)
    got = sorted((r["k"], r["center_id"], r["radius2"]) for r in rows)
    assert got == want
    radii = [r for _, _, r in got]
    assert radii == sorted(radii, reverse=True)
    assert len({c for _, c, _ in got}) == KCENTER_K


def test_spc_matches_python(spark, sf_dir):
    """X236: Python replay of center/sigma and all four Western
    Electric rules over the ordered daily means."""
    import math
    from etl_airflow_spotify_spark.queries.events_ops import (
        SPC_BASELINE_DAYS)
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS sv
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()
    xs = [(day, sv // n) for day, n, sv in daily]
    base = [x for _, x in xs[:SPC_BASELINE_DAYS]]
    bn, bs = len(base), sum(base)
    bss = sum(x * x for x in base)
    center = bs // bn
    sigma = round(math.sqrt(bss * bn - bs * bs) / bn)
    devs = [x - center for _, x in xs]
    want = {}
    for i, (day, x) in enumerate(xs):
        d = devs[i]
        last = lambda k: devs[max(0, i - k + 1):i + 1]
        r1 = 1 if abs(d) > 3 * sigma else 0
        r2 = 1 if (sum(1 for v in last(3) if v > 2 * sigma) >= 2
                   or sum(1 for v in last(3) if v < -2 * sigma) >= 2) \
            else 0
        r3 = 1 if (sum(1 for v in last(5) if v > sigma) >= 4
                   or sum(1 for v in last(5) if v < -sigma) >= 4) else 0
        r4 = 1 if (sum(1 for v in last(8) if v > 0) == 8
                   or sum(1 for v in last(8) if v < 0) == 8) else 0
        want[day] = (x, d, r1, r2, r3, r4,
                     1 if r1 + r2 + r3 + r4 > 0 else 0)
    rows = _rows("spc_control_chart", spark, sf_dir)
    got = {r["day"]: (r["x_micro"], r["dev_micro"], r["r1"], r["r2"],
                      r["r3"], r["r4"], r["alarm"]) for r in rows}
    assert got == want


def test_huber_matches_python(spark, sf_dir):
    """X237: full Python IRLS replay (exact integer moments, double
    solve, micro snap); weights in (0, 1e6]; n_full + n_down = days."""
    from etl_airflow_spotify_spark.queries.events_ops import HUBER_ITERS
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1""").fetchall()
    ys = [int(n) for _, n in daily]
    nd = len(ys)
    c_micro = ((sum(ys) * 1000000) // nd) // 10

    def snap(x):
        import math
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    w = [1000000] * nd
    want = []
    for it in range(1, HUBER_ITERS + 1):
        sw = sum(w)
        swx = sum(wi * x for x, wi in enumerate(w))
        swy = sum(wi * y for wi, y in zip(w, ys))
        swxx = sum(wi * x * x for x, wi in enumerate(w))
        swxy = sum(wi * x * y for x, (wi, y) in enumerate(zip(w, ys)))
        n_full = sum(1 for wi in w if wi == 1000000)
        n_down = nd - n_full
        b = snap((float(sw) * float(swxy) - float(swx) * float(swy))
                 / (float(sw) * float(swxx) - float(swx) * float(swx))
                 * 1000000)
        a = snap((float(swy) * 1000000 - float(b) * float(swx))
                 / float(sw))
        want.append((it, a, b, n_full, n_down, sw))
        if it < HUBER_ITERS:
            w = [1000000 if abs(y * 1000000 - (a + b * x)) <= c_micro
                 else (c_micro * 1000000)
                 // abs(y * 1000000 - (a + b * x))
                 for x, y in enumerate(ys)]
    rows = _rows("huber_irls_trend", spark, sf_dir)
    got = [(r["iter"], r["a_micro"], r["b_micro"], r["n_full"],
            r["n_down"], r["sum_w"])
           for r in sorted(rows, key=lambda x: x["iter"])]
    assert got == want
    for r in rows:
        assert r["n_full"] + r["n_down"] == nd


def test_gmm_em_matches_python(spark, sf_dir):
    """X238: full Python replay of the histogram EM trajectory
    (identical double expressions, micro snaps); weights conserve,
    variances respect the floor, mu1 <= mu2 ordering from init."""
    import math
    from collections import Counter
    from etl_airflow_spotify_spark.queries.ml import EM_ITERS
    vals = duckdb.sql(f"""
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT)
        FROM '{sf_dir}/events.parquet'""").fetchall()
    hist = Counter(v for (v,) in vals)

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    n = sum(hist.values())
    sv = sum(c * v for v, c in hist.items())
    svv = sum(c * v * v for v, c in hist.items())
    cc = 0
    mu1 = mu2 = None
    for v in sorted(hist):
        cc += hist[v]
        if mu1 is None and cc >= (n + 3) // 4:
            mu1 = v
        if mu2 is None and cc >= (3 * n + 3) // 4:
            mu2 = v
    var0 = max(snap((float(svv) - float(sv) * float(sv) / float(n))
                    / float(n)), 1)
    w1, w2, var1, var2 = 500000, 500000, var0, var0
    want = []
    for it in range(1, EM_ITERS + 1):
        r1s = r1v = r1vv = r2s = r2v = r2vv = 0
        for v, cnt in hist.items():
            ll2 = (math.log(float(w2) / 1000000)
                   - 0.5 * math.log(float(var2))
                   - float((v - mu2) * (v - mu2)) / (2 * float(var2)))
            ll1 = (math.log(float(w1) / 1000000)
                   - 0.5 * math.log(float(var1))
                   - float((v - mu1) * (v - mu1)) / (2 * float(var1)))
            r = snap(1000000 / (1 + math.exp(ll2 - ll1)))
            r1s += r * cnt
            r2s += (1000000 - r) * cnt
            r1v += r * cnt * v
            r2v += (1000000 - r) * cnt * v
            r1vv += r * cnt * v * v
            r2vv += (1000000 - r) * cnt * v * v
        w1 = snap(float(r1s) / float(n))
        w2 = 1000000 - w1
        mu1 = snap(float(r1v) / float(r1s))
        mu2 = snap(float(r2v) / float(r2s))
        var1 = max(snap(float(r1vv) / float(r1s)
                        - (float(r1v) / float(r1s)) ** 2), 1)
        var2 = max(snap(float(r2vv) / float(r2s)
                        - (float(r2v) / float(r2s)) ** 2), 1)
        want.append((it, w1, mu1, var1, mu2, var2))
    rows = _rows("gmm_em_values", spark, sf_dir)
    got = [(r["iter"], r["w1_micro"], r["mu1_centi"], r["var1_centi2"],
            r["mu2_centi"], r["var2_centi2"])
           for r in sorted(rows, key=lambda x: x["iter"])]
    assert got == want
    for _, w1g, _, v1g, _, v2g in got:
        assert 0 <= w1g <= 1000000
        assert v1g >= 1 and v2g >= 1


def test_langid_matches_python(spark, sf_dir):
    """X239: full Python replay of profiles, out-of-place distances
    and argmin predictions; confusion counts conserve the test split."""
    from collections import Counter, defaultdict
    from etl_airflow_spotify_spark.queries.text import CT_PROFILE_K
    docs = duckdb.sql(f"""
        SELECT doc_id, lang, lower(text)
        FROM '{sf_dir}/documents.parquet'
        WHERE length(text) >= 3""").fetchall()

    def grams(t):
        return [t[i:i + 3] for i in range(len(t) - 2)]

    def topk(cnt):
        order = sorted(cnt, key=lambda g: (-cnt[g], g))[:CT_PROFILE_K]
        return {g: i + 1 for i, g in enumerate(order)}

    lang_cnt = defaultdict(Counter)
    for did, lang, t in docs:
        if did % 2 == 0:
            lang_cnt[lang].update(grams(t))
    prof = {lang: topk(c) for lang, c in lang_cnt.items()}
    conf = Counter()
    dist_mass = Counter()
    for did, lang, t in docs:
        if did % 2 == 0:
            continue
        dp = topk(Counter(grams(t)))
        best = None
        for cand in sorted(prof):
            d = sum(abs(dr - prof[cand][g]) if g in prof[cand]
                    else CT_PROFILE_K for g, dr in dp.items())
            if best is None or (d, cand) < best:
                best = (d, cand)
        conf[(lang, best[1])] += 1
        dist_mass[(lang, best[1])] += best[0]
    rows = _rows("langid_rank_profile", spark, sf_dir)
    got = {(r["true_lang"], r["pred_lang"]): (r["n_docs"],
                                              r["total_dist"])
           for r in rows}
    want = {k: (conf[k], dist_mass[k]) for k in conf}
    assert got == want
    n_test = sum(1 for did, _, _ in docs if did % 2 == 1)
    assert sum(v[0] for v in got.values()) == n_test


def test_pca_matches_python(spark, sf_dir):
    """X240: Python replay of moments -> covariance -> eigenvalues;
    trace and determinant identities (lam1+lam2 = cxx+cyy,
    lam1*lam2 = det) and lam1 >= lam2 >= 0 (PSD covariance)."""
    import math
    from collections import defaultdict
    pts = duckdb.sql(f"""
        SELECT l_returnflag, CAST(l_quantity AS BIGINT),
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    by = defaultdict(list)
    for f, x, y in pts:
        by[f].append((x, y))

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    rows = _rows("pca_closed_form", spark, sf_dir)
    got = {r["flag"]: r for r in rows}
    assert set(got) == set(by)
    for f, xs in by.items():
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        nd = float(n)
        cxx = (nd * float(sxx) - float(sx) * float(sx)) / (nd * nd)
        cyy = (nd * float(syy) - float(sy) * float(sy)) / (nd * nd)
        cxy = (nd * float(sxy) - float(sx) * float(sy)) / (nd * nd)
        disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)
        lam1 = (cxx + cyy + disc) / 2
        lam2 = (cxx + cyy - disc) / 2
        r = got[f]
        assert r["n"] == n
        assert r["lam1"] == round(lam1, 4)
        assert r["lam2"] == round(lam2, 4)
        assert r["evr_micro"] == snap(lam1 / (lam1 + lam2) * 1000000)
        assert r["slope_micro"] == snap((lam1 - cxx) / cxy * 1000000)
        assert r["lam1"] >= r["lam2"] >= 0
        assert abs((lam1 + lam2) - (cxx + cyy)) < 1e-6 * abs(cxx + cyy)


def test_densest_subgraph_matches_python(spark, sf_dir):
    """X241: Python replay of the batch peeling; graph strictly
    shrinks every non-empty round; density identity 2E/2V."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.graph import DSG_ROUNDS
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    active = set(adj)
    want = []
    for r in range(1, DSG_ROUNDS + 1):
        deg = {v: sum(1 for u in adj[v] if u in active)
               for v in active}
        nv = len(active)
        e2 = sum(deg.values())
        keep = {v for v in active if deg[v] * nv > e2}
        want.append((r, nv, e2 // 2,
                     (e2 * 500000) // nv if nv > 0 else 0,
                     nv - len(keep)))
        active = keep
    rows = _rows("densest_subgraph_peel", spark, sf_dir)
    got = [(r["round"], r["n_nodes"], r["n_edges"], r["density_micro"],
            r["n_peeled"]) for r in sorted(rows,
                                           key=lambda x: x["round"])]
    assert got == want
    for i in range(1, len(got)):
        prev_nodes = got[i - 1][1]
        if prev_nodes > 0:
            assert got[i][1] < prev_nodes or got[i][1] == 0


def test_betweenness_matches_python(spark, sf_dir):
    """X242: full Python replay of the k-seed radius-bounded Brandes
    sweep (exact sigma, micro-snapped dependency terms); sigma
    composition law sigma(v) = sum of predecessor sigmas; top-20
    ordering matches."""
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.graph import (
        BC_LEVELS, BC_SEEDS)
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    seeds = sorted(adj)[:BC_SEEDS]

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    bc = defaultdict(int)
    npaths = defaultdict(int)
    for s in seeds:
        level = {0: {s: 1}}
        seen = {s}
        for l in range(1, BC_LEVELS + 1):
            nxt = defaultdict(int)
            for u, sig in level[l - 1].items():
                for w in adj[u]:
                    if w not in seen:
                        nxt[w] += sig
            level[l] = dict(nxt)
            seen |= set(nxt)
        delta = {v: 0 for v in level[BC_LEVELS]}
        for l in range(BC_LEVELS - 1, 0, -1):
            nd = {}
            for v, sig in level[l].items():
                tot = 0
                for w in adj[v]:
                    if w in level[l + 1]:
                        tot += snap(float(sig)
                                    * (1000000 + delta[w])
                                    / level[l + 1][w])
                nd[v] = tot
            delta = nd
            for v, dv in nd.items():
                bc[v] += dv
                npaths[v] += 1
        # levels below BC_LEVELS-1 already folded via the loop; the
        # deepest level contributes its (zero) deltas too:
        for v in level[BC_LEVELS]:
            npaths[v] += 1
    want = sorted(((v, bc[v], npaths[v]) for v in npaths),
                  key=lambda t: (-t[1], t[0]))[:20]
    rows = _rows("betweenness_kseeds", spark, sf_dir)
    got = [(r["v"], r["bc_micro"], r["n_seed_paths"]) for r in rows]
    assert got == want
    # sigma composition: replayed independently per seed above; the
    # Spark result matching the replay pins it transitively.
    assert all(b >= 0 for _, b, _ in got)


def test_temporal_census_matches_python(spark, sf_dir):
    """X243: Python replay of dated edges, triangle enumeration and
    the (tie-structure, first-edge, span) census; total triangles
    conserve across cells."""
    from collections import Counter, defaultdict
    from datetime import date
    from etl_airflow_spotify_spark.queries.graph import TM_WINDOW_DAYS
    rows_db = duckdb.sql(f"""
        SELECT DISTINCT o.o_orderkey,
               CAST(o.o_orderdate AS DATE), l.l_partkey
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey""").fetchall()
    epoch = date(1992, 1, 1)
    by_order = defaultdict(lambda: (None, set()))
    for g, d, i in rows_db:
        t = (d - epoch).days
        cur = by_order[g]
        by_order[g] = (t, cur[1] | {i})
    ed = {}
    for g, (t, items) in by_order.items():
        items = sorted(items)
        for a in range(len(items)):
            for b in range(a + 1, len(items)):
                k = (items[a], items[b])
                ed[k] = min(ed.get(k, t), t)
    adj = defaultdict(dict)
    for (lo, hi), t in ed.items():
        adj[lo][hi] = t
    census = Counter()
    span_mass = Counter()
    for (x, y), t1 in ed.items():
        for z, t2 in adj.get(y, {}).items():
            t3 = adj.get(x, {}).get(z)
            if t3 is None:
                continue
            if t1 != t2 and t2 != t3 and t1 != t3:
                p = "strict"
            elif t1 == t2 == t3:
                p = "tie3"
            else:
                p = "tie2"
            first = ("1" if t1 <= t2 and t1 <= t3
                     else "2" if t2 <= t3 else "3")
            span = max(t1, t2, t3) - min(t1, t2, t3)
            bucket = "within" if span <= TM_WINDOW_DAYS else "beyond"
            census[(f"{p}:{first}", bucket)] += 1
            span_mass[(f"{p}:{first}", bucket)] += span
    rows = _rows("temporal_triangle_census", spark, sf_dir)
    got = {(r["pattern"], r["span_bucket"]):
           (r["n_triangles"], r["sum_span_days"]) for r in rows}
    want = {k: (census[k], span_mass[k]) for k in census}
    assert got == want
    assert sum(v[0] for v in got.values()) == sum(census.values())


def test_propensity_att_matches_python(spark, sf_dir):
    """X244: Python replay of propensities, strata, gaps and the
    treated-weighted ATT; unit counts conserve."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.ml import PS_STRATA
    units = duckdb.sql(f"""
        SELECT p.p_brand,
               CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END,
               CAST(l.l_quantity AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p
          ON p.p_partkey = l.l_partkey""").fetchall()
    cell = defaultdict(lambda: [0, 0])
    for b, tr, _ in units:
        cell[b][0] += tr
        cell[b][1] += 1
    e = {b: (v[0] * 1000000) // v[1] for b, v in cell.items()}
    per = defaultdict(lambda: [0, 0, 0, 0])
    for b, tr, y in units:
        s = min(PS_STRATA - 1, (e[b] * PS_STRATA) // 1000000)
        st = per[s]
        if tr:
            st[0] += 1
            st[2] += y
        else:
            st[1] += 1
            st[3] += y
    want = {}
    wsum = gsum = 0
    for s, (nt, nc, yt, yc) in per.items():
        if nt == 0 or nc == 0:
            continue
        gap = (yt * 1000000) // nt - (yc * 1000000) // nc
        want[s] = (nt, nc, gap)
        wsum += nt
        gsum += nt * gap
    # DuckDB // and Spark DIV both truncate toward zero:
    att = gsum // wsum if gsum >= 0 else -((-gsum) // wsum)
    want[-1] = (wsum, sum(v[1] for v in want.values() if True), att)
    rows = _rows("propensity_stratified_att", spark, sf_dir)
    got = {r["stratum"]: (r["n_treated"], r["n_control"],
                          r["att_micro"]) for r in rows}
    for s in got:
        if s == -1:
            assert got[s][0] == wsum
            assert got[s][2] == att
        else:
            assert got[s] == want[s]
    assert set(got) - {-1} == set(want) - {-1}


def test_kruskal_wallis_matches_python(spark, sf_dir):
    """X245: Python replay of midranks, rank masses, the split-
    division H fold and tie correction; rank mass conserves
    (sum R2_i = N(N+1)); H within float distance of scipy-free
    textbook H."""
    from collections import Counter, defaultdict
    pts = duckdb.sql(f"""
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT)
        FROM '{sf_dir}/events.parquet'""").fetchall()
    hist = Counter(v for _, v in pts)
    bytype = defaultdict(Counter)
    for g, v in pts:
        bytype[g][v] += 1
    m2 = {}
    cum = 0
    for v in sorted(hist):
        m2[v] = 2 * cum + hist[v] + 1
        cum += hist[v]
    n = sum(hist.values())
    ties = sum(c * c * c - c for c in hist.values())
    want = {}
    t_sum = 0
    for g, cnts in bytype.items():
        n_i = sum(cnts.values())
        r2 = sum(ct * m2[v] for v, ct in cnts.items())
        a = abs(r2 - n_i * (n + 1))
        q, r = a // n_i, a % n_i
        t_i = q * q * n_i + 2 * q * r + (r * r) // n_i
        t_sum += t_i
        want[g] = (n_i, r2)
    s3 = 3 * t_sum
    m = n * (n + 1)
    h_micro = (s3 // m) * 1000000 + ((s3 % m) * 1000000) // m
    c_milli = ((n * n * n - n - ties) * 1000) // (n * n * n - n)
    h_adj = (h_micro * 1000) // c_milli
    rows = _rows("kruskal_wallis_values", spark, sf_dir)
    got = {r["grp"]: (r["n_i"], r["rank_mass2"]) for r in rows}
    assert got == want
    assert sum(r2 for _, r2 in want.values()) == n * (n + 1)
    for r in rows:
        assert r["h_micro"] == h_micro
        assert r["h_adj_micro"] == h_adj
        assert r["h_adj_micro"] >= r["h_micro"]


def test_zonemap_soundness_and_replay(spark, sf_dir):
    """X246: zone-map soundness — a skipped group contains NO matching
    row (rows_matched <= rows_scanned for every predicate, and the
    Python replay of group stats + skip decisions agrees)."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.scale import (
        ZM_PREDS, ZM_RG_DIV)
    rows_db = duckdb.sql(f"""
        SELECT l_orderkey // {ZM_RG_DIV},
               CAST(date_diff('day', DATE '1992-01-01',
                    CAST(l_shipdate AS DATE)) AS BIGINT),
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),
               CAST(l_quantity AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    groups = defaultdict(list)
    for rg, ship, price, qty in rows_db:
        groups[rg].append((ship, price, qty))
    col_ix = {"ship": 0, "price": 1, "qty": 2}
    want = {}
    for pid, col, lo, hi in ZM_PREDS:
        ix = col_ix[col]
        n_groups = len(groups)
        n_skipped = rows_scanned = rows_matched = rows_total = 0
        for rg, rs in groups.items():
            vals = [r[ix] for r in rs]
            rows_total += len(rs)
            if max(vals) < lo or min(vals) > hi:
                n_skipped += 1
                assert not any(lo <= v <= hi for v in vals)
            else:
                rows_scanned += len(rs)
                rows_matched += sum(1 for v in vals if lo <= v <= hi)
        waste = (((rows_scanned - rows_matched) * 1000000)
                 // rows_scanned if rows_scanned else 0)
        want[pid] = (col, n_groups, n_skipped, rows_total,
                     rows_scanned, rows_matched,
                     (n_skipped * 1000000) // n_groups, waste)
    rows = _rows("zonemap_skip_audit", spark, sf_dir)
    got = {r["pid"]: (r["col"], r["n_groups"], r["n_skipped"],
                      r["rows_total"], r["rows_scanned"],
                      r["rows_matched"], r["skip_frac_micro"],
                      r["waste_micro"]) for r in rows}
    assert got == want
    for pid, t in got.items():
        assert t[5] <= t[4]


def test_smith_waterman_matches_python(spark, sf_dir):
    """X247: full-matrix Python SW replay; 0 <= score <= 4*match;
    local >= 0 always (vs NW which can go negative)."""
    from etl_airflow_spotify_spark.queries.events_ops import (
        SW_GAP, SW_MATCH, SW_MISMATCH, SW_TEMPLATE)
    seqs = duckdb.sql(f"""
        SELECT user_id, list(event_type ORDER BY ts, event_id)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id""").fetchall()

    def sw(tokens):
        m = len(SW_TEMPLATE)
        row = [0] * (m + 1)
        best = 0
        for t in tokens:
            new = [0]
            for j in range(1, m + 1):
                s = (SW_MATCH if t == SW_TEMPLATE[j - 1]
                     else SW_MISMATCH)
                new.append(max(0, row[j - 1] + s, row[j] + SW_GAP,
                               new[j - 1] + SW_GAP))
                best = max(best, new[j])
            row = new
        return best

    want = {uid: (len(toks), sw(toks)) for uid, toks in seqs}
    rows = _rows("funnel_local_alignment", spark, sf_dir)
    got = {r["user_id"]: (r["n_events"], r["local_score"])
           for r in rows}
    assert got == want
    for uid, (_, sc) in got.items():
        assert 0 <= sc <= 4 * SW_MATCH


def test_platt_matches_python(spark, sf_dir):
    """X248: Python Newton replay on the reliability cells; clamped
    probabilities; A negative (higher score -> more correct)."""
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.similarity import (
        ISO_BIN_W, PLATT_ITERS)
    # reliability cells via the oracle's own rocchio construction is
    # heavy to replay; read them from the Spark-side helper instead.
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import similarity as S
    import pyspark.sql.functions as FF
    e = load_table(spark, sf_dir, "embeddings")
    cents = S.label_centroids(e, "label", "embedding", digits=6)
    best = S.assign_nearest_centroid(
        e, cents, id_col="vec_id", vec_col="embedding",
        label_col="label", score_digits=4)
    correct = FF.when(FF.col("pred") == FF.col("label"), 1).otherwise(0)
    cells = (best.groupBy(FF.floor(FF.col("score") / ISO_BIN_W)
                          .cast("long").alias("bin"))
             .agg(FF.count("*").cast("long").alias("n"),
                  FF.sum(correct).cast("long").alias("nc"))).collect()
    cells = [(r["bin"], r["n"], r["nc"]) for r in cells]

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    npos = sum(nc for _, _, nc in cells)
    nneg = sum(n - nc for _, n, nc in cells)
    a, b = 0, snap(math.log(float(nneg) / npos) * 1000000)
    want = []
    for it in range(1, PLATT_ITERS + 1):
        ga = gb = haa = hab = hbb = ll = 0
        for s, n, nc in cells:
            pm = min(999999, max(1, snap(
                1000000 / (1 + math.exp((float(a) * s + b)
                                        / 1000000)))))
            w = (pm * (1000000 - pm)) // 1000000
            ga += s * (nc * 1000000 - n * pm)
            gb += nc * 1000000 - n * pm
            haa += n * w * s * s
            hab += n * w * s
            hbb += n * w
            ll += snap((nc * math.log(float(pm) / 1000000)
                        + (n - nc) * math.log(1 - float(pm) / 1000000))
                       * 1000000)
        det = float(haa) * hbb - float(hab) * hab
        a = a - snap((float(hbb) * ga - float(hab) * gb) / det * 1000000)
        b = b - snap((float(haa) * gb - float(hab) * ga) / det * 1000000)
        want.append((it, a, b, ll))
    rows = _rows("platt_scaling_calibration", spark, sf_dir)
    got = [(r["iter"], r["a_micro"], r["b_micro"], r["ll_micro"])
           for r in sorted(rows, key=lambda x: x["iter"])]
    assert got == want
    assert got[-1][1] < 0  # higher score -> higher correctness
    lls = [r[3] for r in got]
    # Newton can overshoot on step 1 and the micro-snapped params
    # jitter a few micro-nats at the optimum; require net improvement
    # and late-stage convergence instead of per-step monotonicity.
    assert lls[-1] >= lls[0]
    assert abs(lls[-1] - lls[-2]) <= 1000


def test_rank_correlation_matches_python(spark, sf_dir):
    """X249: Python replay of pair counts, tau-b and tie-aware
    Spearman; both inside [-1, 1] micro."""
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.relational import (
        RC_YEAR_A, RC_YEAR_B)
    rev = duckdb.sql(f"""
        SELECT p.p_brand, EXTRACT(year FROM l.l_shipdate),
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                   * 100, 0) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE EXTRACT(year FROM l.l_shipdate)
              IN ({RC_YEAR_A}, {RC_YEAR_B})
        GROUP BY 1, 2""").fetchall()
    wide = defaultdict(lambda: [0, 0])
    for brand, yr, r in rev:
        wide[brand][0 if yr == RC_YEAR_A else 1] = int(r)
    items = sorted(wide.items())
    c = d = tx = ty = np_ = 0
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (xa, ya), (xb, yb) = items[i][1], items[j][1]
            np_ += 1
            prod = (xa - xb) * (ya - yb)
            if prod > 0:
                c += 1
            elif prod < 0:
                d += 1
            elif xa == xb and ya != yb:
                tx += 1
            elif ya == yb and xa != xb:
                ty += 1
    tau = round((c - d) / math.sqrt(float(c + d + tx)
                                    * (c + d + ty)) * 1000000)

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0] * len(vals)
        from collections import Counter
        cnt = Counter(vals)
        rank = {}
        seen = 0
        for v in sorted(cnt):
            rank[v] = 2 * seen + cnt[v] + 1
            seen += cnt[v]
        return [rank[v] for v in vals]

    xs = [v[0] for _, v in items]
    ys = [v[1] for _, v in items]
    mx, my = midranks(xs), midranks(ys)
    n = len(mx)
    sx, sy = sum(mx), sum(my)
    sxx = sum(a * a for a in mx)
    syy = sum(a * a for a in my)
    sxy = sum(a * b for a, b in zip(mx, my))
    rho = round((float(n) * sxy - float(sx) * sy)
                / math.sqrt((float(n) * sxx - float(sx) * sx)
                            * (float(n) * syy - float(sy) * sy))
                * 1000000)
    r = _rows("rank_correlation_brands", spark, sf_dir)[0]
    assert (r["n_pairs"], r["concordant"], r["discordant"],
            r["ties_x"], r["ties_y"]) == (np_, c, d, tx, ty)
    assert r["tau_b_micro"] == tau
    assert r["spearman_micro"] == rho
    assert -1000000 <= tau <= 1000000
    assert -1000000 <= rho <= 1000000


def test_periodogram_matches_python(spark, sf_dir):
    """X250: Python replay of centered folds and power; power >= 0;
    centering exactness (sum of y over days = 0)."""
    import math
    from etl_airflow_spotify_spark.queries.events_ops import (
        PGRAM_PERIODS)
    daily = duckdb.sql(f"""
        SELECT CAST(date_trunc('day', ts) AS DATE), COUNT(*)
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1 ORDER BY 1""").fetchall()
    xs = [int(n) for _, n in daily]
    n = len(xs)
    s = sum(xs)
    ys = [x * n - s for x in xs]
    assert sum(ys) == 0

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    rows = _rows("daily_periodogram", spark, sf_dir)
    got = {r["period"]: (r["a_fold"], r["b_fold"], r["power"])
           for r in rows}
    for p in PGRAM_PERIODS:
        a = sum(y * snap(math.cos(2 * math.pi * (t % p) / p) * 1000000)
                for t, y in enumerate(ys))
        b = sum(y * snap(math.sin(2 * math.pi * (t % p) / p) * 1000000)
                for t, y in enumerate(ys))
        power = round((float(a) * a + float(b) * b) / 1e12, 4)
        assert got[p] == (a, b, power)
        assert got[p][2] >= 0


def test_borda_condorcet_matches_python(spark, sf_dir):
    """X251: Python replay of rankings, Borda scores and the duel
    matrix; Borda total conserves (sum = 3*n(n-1)/2); at most one
    Condorcet winner."""
    from collections import defaultdict
    stats = duckdb.sql(f"""
        SELECT p.p_brand,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                   * 100, 0) AS BIGINT)),
               SUM(CAST(l.l_quantity AS BIGINT)),
               COUNT(DISTINCT l.l_partkey)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        GROUP BY 1""").fetchall()
    n = len(stats)

    def rank_of(ix):
        order = sorted(stats, key=lambda r: (-int(r[ix]), r[0]))
        return {r[0]: i + 1 for i, r in enumerate(order)}

    r1, r2, r3 = rank_of(1), rank_of(2), rank_of(3)
    want = {}
    for b, *_ in stats:
        wins = sum(
            1 for o, *_ in stats if o != b
            and ((r1[b] < r1[o]) + (r2[b] < r2[o])
                 + (r3[b] < r3[o])) >= 2)
        want[b] = (r1[b], r2[b], r3[b],
                   3 * n - r1[b] - r2[b] - r3[b], wins,
                   1 if wins == n - 1 else 0)
    rows = _rows("borda_condorcet_brands", spark, sf_dir)
    got = {r["brand"]: (r["r_rev"], r["r_qty"], r["r_var"], r["borda"],
                        r["wins"], r["is_condorcet_winner"])
           for r in rows}
    assert got == want
    assert sum(v[3] for v in got.values()) == 3 * n * (n - 1) // 2
    assert sum(v[5] for v in got.values()) <= 1


def test_randomization_test_matches_python(spark, sf_dir):
    """X252: md5 replay of every pseudo-assignment, gap and the
    Monte Carlo p-value; perm 0 is the observed assignment; counts
    conserve per permutation."""
    import hashlib
    from etl_airflow_spotify_spark.queries.ml import RT_PERMS
    units = duckdb.sql(f"""
        SELECT l_orderkey * 10 + l_linenumber,
               CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END,
               CAST(l_quantity AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()
    ntr = sum(tr for _, tr, _ in units)
    pt = (ntr * 1000000) // len(units)
    want = {}
    for k in range(RT_PERMS + 1):
        nt = nc = yt = yc = 0
        for rid, tr, y in units:
            if k == 0:
                a = tr
            else:
                h = int(hashlib.md5(f"rt:{k}:{rid}".encode())
                        .hexdigest()[:15], 16) % 1000000
                a = 1 if h < pt else 0
            if a:
                nt += 1
                yt += y
            else:
                nc += 1
                yc += y
        gap = (yt * 1000000) // nt - (yc * 1000000) // nc
        want[k] = (nt, nc, gap)
    og = abs(want[0][2])
    ne = sum(1 for k in range(1, RT_PERMS + 1)
             if abs(want[k][2]) >= og)
    pv = ((1 + ne) * 1000000) // (RT_PERMS + 1)
    rows = _rows("randomization_test_discount", spark, sf_dir)
    got = {r["perm"]: (r["nt"], r["nc"], r["gap_micro"]) for r in rows}
    assert got == want
    for r in rows:
        assert r["p_value_micro"] == pv
        assert r["exceeds"] == (1 if r["perm"] > 0
                                and abs(r["gap_micro"]) >= og else 0)
        assert r["nt"] + r["nc"] == len(units)
    assert 0 < pv <= 1000000


def test_disparity_backbone_matches_python(spark, sf_dir):
    """X253: Python replay of per-direction alphas, the either-
    endpoint rule and the threshold curve; curve is monotone in the
    threshold; backbone concentrates weight (weight frac >= edge
    frac at every threshold)."""
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.graph import DF_ALPHAS
    edges = _copurchase_edges(sf_dir)
    w = defaultdict(int)
    li = duckdb.sql(f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT a.i, b.i, COUNT(*)
        FROM op a JOIN op b ON a.g = b.g AND a.i <> b.i
        GROUP BY 1, 2""").fetchall()
    for s_, d_, c in li:
        w[(s_, d_)] = int(c)
    st = defaultdict(lambda: [0, 0])
    for (s_, d_), wt in w.items():
        st[s_][0] += wt
        st[s_][1] += 1

    def snap(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    a_min = {}
    und_w = {}
    for (s_, d_), wt in w.items():
        s_tot, k = st[s_]
        if k <= 1:
            am = 1000000
        else:
            am = snap(math.pow(1 - float(wt) / s_tot, k - 1) * 1000000)
        key = (min(s_, d_), max(s_, d_))
        a_min[key] = min(a_min.get(key, 10**9), am)
        und_w[key] = max(und_w.get(key, 0), wt)
    n_edges = len(und_w)
    w_total = sum(und_w.values())
    want = {}
    for t in DF_ALPHAS:
        nk = sum(1 for k_ in und_w if a_min[k_] < t)
        wk = sum(und_w[k_] for k_ in und_w if a_min[k_] < t)
        want[t] = (nk, wk, (nk * 1000000) // n_edges,
                   (wk * 1000000) // w_total)
    rows = _rows("disparity_backbone", spark, sf_dir)
    got = {r["alpha_micro"]: (r["n_kept"], r["w_kept"],
                              r["edge_frac_micro"],
                              r["weight_frac_micro"]) for r in rows}
    assert got == want
    curve = [got[t][0] for t in sorted(got)]
    assert curve == sorted(curve)  # monotone in the threshold
    for t, (nk, wk, ef, wf) in got.items():
        assert wf >= ef  # the backbone concentrates weight
