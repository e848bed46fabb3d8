"""X42 graph analytics: fixed-point PageRank laws.

The integer recurrence is deterministic, so the distributed result must
match a pure-Python replay EXACTLY (not approximately) on any graph."""

from __future__ import annotations

from etl_airflow_spotify_spark.operators import graph as G


def _py_pagerank(edges, iters):
    """Driver-side replay of the exact integer recurrence."""
    from collections import defaultdict
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    tp = (15 * G.SCALE) // (100 * n)
    r = {v: G.SCALE // n for v in deg}
    for _ in range(iters):
        acc = defaultdict(int)
        for s, d in edges:
            acc[d] += r[s] // deg[s]
        r = {v: tp + (G.DAMP_NUM * c) // 100 for v, c in acc.items()}
    return r, dict(deg)


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def test_pagerank_matches_python_replay_exactly(spark):
    # triangle {1,2,3} + pendant 4-1 + isolated pair 5-6
    edges = _sym([(1, 2), (2, 3), (1, 3), (1, 4), (5, 6)])
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["pr"], r["degree"])
           for r in G.pagerank_fixed(edf, iters=4).collect()}
    want_r, want_d = _py_pagerank(edges, 4)
    assert got == {v: (want_r[v], want_d[v]) for v in want_r}
    # hub 1 (degree 3) outranks every triangle peer and the pendant
    assert got[1][0] > got[2][0] == got[3][0] > got[4][0]


def test_pagerank_mass_conservation_bound(spark):
    # undirected graphs lose only integer-floor dust: total rank stays
    # within (edges + nodes) ulps of SCALE below it, never above
    edges = _sym([(i, i + 1) for i in range(1, 30)] + [(1, 15), (7, 22)])
    edf = spark.createDataFrame(edges, "src long, dst long")
    rows = G.pagerank_fixed(edf, iters=5).collect()
    total = sum(r["pr"] for r in rows)
    assert total <= G.SCALE
    assert G.SCALE - total < 100 * (len(edges) + len(rows))


def _py_sssp(edges, seeds, rounds):
    """Driver-side replay of bounded Bellman-Ford over weighted edges."""
    w = {(s, d): 1 + (s + d) % 7 for s, d in edges}
    dist = {v: 0 for v in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for (s, d), wt in w.items():
            if s in dist and dist[s] + wt < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + wt
        dist = nxt
    return dist


def test_sssp_matches_python_replay_exactly(spark):
    # path 1-2-3-4 + shortcut 1-4 (weight depends on endpoint sum) +
    # unreachable pair 8-9
    edges = _sym([(1, 2), (2, 3), (3, 4), (1, 4), (8, 9)])
    ew = G.edge_weights(spark.createDataFrame(edges, "src long, dst long"))
    seeds = spark.createDataFrame([(1, 0)], "node long, d long")
    got = {r["node"]: r["d"] for r in G.sssp_bounded(ew, seeds, 3).collect()}
    assert got == _py_sssp(edges, {1}, 3)
    assert 8 not in got and 9 not in got  # disconnected stays unlabelled
    assert got[1] == 0


def test_sssp_more_rounds_never_increase_distance(spark):
    edges = _sym([(i, i + 1) for i in range(1, 12)] + [(1, 6), (4, 11)])
    ew = G.edge_weights(spark.createDataFrame(edges, "src long, dst long"))
    seeds = spark.createDataFrame([(1, 0)], "node long, d long")
    d2 = {r["node"]: r["d"] for r in G.sssp_bounded(ew, seeds, 2).collect()}
    d4 = {r["node"]: r["d"] for r in G.sssp_bounded(ew, seeds, 4).collect()}
    assert set(d2) <= set(d4)
    assert all(d4[v] <= d2[v] for v in d2)


def _py_label_prop(edges, rounds):
    """Driver-side replay: same weights, same two-aggregate argmax
    (max weight sum, min label on ties), same synchronous rounds."""
    from collections import defaultdict
    nodes = {s for s, _ in edges}
    labs = {v: v for v in nodes}
    for _ in range(rounds):
        score = defaultdict(int)
        for s, d in edges:
            score[(d, labs[s])] += 1 + (s + d) % 7
        best = {}
        for (n, lab), sc in score.items():
            cur = best.get(n)
            if cur is None or (-sc, lab) < cur[0]:
                best[n] = ((-sc, lab), lab)
        labs = {n: v[1] for n, v in best.items()}
    return labs


def test_label_propagation_matches_python_replay_exactly(spark):
    # two 3-cliques joined by one bridge (the bridge edge happens to be
    # the HEAVIEST weight — good adversarial case for the argmax)
    cliques = _sym([(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
                    (3, 10)])
    ew = G.edge_weights(spark.createDataFrame(cliques, "src long, dst long"))
    for rounds in (1, 3):
        got = {r["node"]: r["lab"]
               for r in G.label_propagation(ew, rounds).collect()}
        assert got == _py_label_prop(cliques, rounds)
    assert set(got.values()) <= set(got)  # labels are node ids


def test_cooccurrence_edges_symmetric_distinct(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 11), (2, 10), (2, 11), (3, 12)],
        "g long, i long")
    got = sorted((r["src"], r["dst"]) for r in
                 G.cooccurrence_edges(df, "g", "i").collect())
    assert got == [(10, 11), (11, 10)]
