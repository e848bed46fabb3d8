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


def test_cooccurrence_edges_symmetric_distinct(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 11), (2, 10), (2, 11), (3, 12)],
        "g long, i long")
    got = sorted((r["src"], r["dst"]) for r in
                 G.cooccurrence_edges(df, "g", "i").collect())
    assert got == [(10, 11), (11, 10)]
