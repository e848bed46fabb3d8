"""Round-10 (optimization round 2) law tests: each one pins an
optimization that changed an operator's internals to the semantics of
the form it replaced."""

from __future__ import annotations

import random

import pyspark.sql.functions as F


# ---------------------------------------------------------------- X295
def test_hdbscan_core_distance_counter_equals_window(spark):
    """The r10 bounded-domain k-th-smallest aggregate must match the
    row_number window it replaced EXACTLY, including tie behavior:
    the k-th order statistic's VALUE is tie-order-independent, and the
    >= k membership filter equals the old kn == K filter. Heavy-tie
    synthetic data (all-equal distances, boundary counts k-1/k/k+1)."""
    from pyspark.sql import Window

    from etl_airflow_spotify_spark.queries.ml import HDB_EPS2, HDB_K

    random.seed(10)
    rows = []
    for ia in range(300):
        n = random.choice([0, 1, HDB_K - 1, HDB_K, HDB_K + 1, 9, 17])
        if ia % 7 == 0:
            # all-tied distances: every permutation of row_number rank
            # must yield the same 4th value
            rows += [(ia, random.randint(0, HDB_EPS2))] * n
        else:
            rows += [(ia, random.randint(0, HDB_EPS2)) for _ in range(n)]
    pairs = spark.createDataFrame(rows, "ia long, d2 long")

    wk = Window.partitionBy("ia").orderBy("d2")
    old = (pairs.select("ia", "d2", F.row_number().over(wk).alias("rk"))
           .filter(F.col("rk") <= HDB_K)
           .groupBy(F.col("ia").alias("id"))
           .agg(F.max("d2").cast("long").alias("cd2"),
                F.count("*").alias("kn"))
           .filter(F.col("kn") == HDB_K)
           .select("id", "cd2"))

    cum = [F.sum(F.when(F.col("d2") <= v, 1).otherwise(0))
           .cast("long").alias(f"le{v}") for v in range(HDB_EPS2 + 1)]
    kth = F.lit(None).cast("long")
    for v in range(HDB_EPS2, -1, -1):
        kth = F.when(F.col(f"le{v}") >= HDB_K, F.lit(v)).otherwise(kth)
    new = (pairs.groupBy(F.col("ia").alias("id")).agg(*cum)
           .filter(F.col(f"le{HDB_EPS2}") >= HDB_K)
           .select("id", kth.cast("long").alias("cd2")))

    assert sorted(map(tuple, old.collect())) == \
        sorted(map(tuple, new.collect()))


# ---------------------------------------------------------------- X228
def test_link_prediction_term_preattach_identity(spark):
    """The r10 pre-attached per-center AA/RA terms must reproduce the
    row-wise aggregate they replaced EXACTLY: for the same wedge
    multiset, SUM over pre-attached t(d) columns == SUM over the
    expressions evaluated per wedge row (incl. d = 1 centers, whose
    NULL AA term never meets a na < nb wedge)."""
    random.seed(11)
    edges = []
    for z in range(80):
        k = random.choice([1, 1, 2, 3, 5, 9])
        nbrs = random.sample(range(1000, 1060), k)
        edges += [(z, n) for n in nbrs]
    etr = spark.createDataFrame(edges, "src long, dst long")

    deg = etr.groupBy(F.col("src").alias("z")) \
        .agg(F.count("*").cast("long").alias("d"))
    wa = etr.select(F.col("src").alias("z"), F.col("dst").alias("na"))
    wb = etr.select(F.col("src").alias("z"), F.col("dst").alias("nb"))

    old = (wa.join(wb, "z").filter(F.col("na") < F.col("nb"))
           .join(deg, "z")
           .groupBy(F.col("na").alias("lo"), F.col("nb").alias("hi"))
           .agg(F.count("*").cast("long").alias("cn"),
                F.sum(F.expr(
                    "1000000000000 DIV CAST(ROUND(log2(d) * 1000000)"
                    " AS BIGINT)")).cast("long").alias("aa"),
                F.sum(F.expr("1000000000 DIV d")).cast("long")
                .alias("ra")))

    degw = deg.select(
        "z",
        F.expr("CASE WHEN d < 2 THEN CAST(NULL AS BIGINT) ELSE "
               "1000000000000 DIV CAST(ROUND(log2(d) * 1000000)"
               " AS BIGINT) END").alias("aat"),
        F.expr("1000000000 DIV d").alias("rat"))
    new = (wa.join(F.broadcast(wb.join(F.broadcast(degw), "z")), "z")
           .filter(F.col("na") < F.col("nb"))
           .groupBy(F.col("na").alias("lo"), F.col("nb").alias("hi"))
           .agg(F.count("*").cast("long").alias("cn"),
                F.sum("aat").cast("long").alias("aa"),
                F.sum("rat").cast("long").alias("ra")))

    assert sorted(map(tuple, old.collect())) == \
        sorted(map(tuple, new.collect()))


# ------------------------------------------------------------- X30 star
def test_star_cc_local_finish_matches_union_find(spark):
    """The r10 local-finish gate (driver union-find once the contracted
    edge set is below _CC_LOCAL_FINISH_EDGE_MAX) must produce the same
    (id, cluster_id = min id in component) map as an independent
    union-find, including singleton/self-loop handling."""
    import etl_airflow_spotify_spark.operators.dedup as D

    random.seed(42)
    n = 4000
    edges = [(random.randint(0, n), random.randint(0, n))
             for _ in range(6000)] + [(99991, 99991)]  # self-loop node
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in D.connected_components_star(df).collect()}

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    comp: dict = {}
    for v in nodes:
        comp.setdefault(find(v), []).append(v)
    want = {}
    for mem in comp.values():
        m = min(mem)
        for v in mem:
            want[v] = m
    assert got == want
