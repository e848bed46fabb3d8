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
