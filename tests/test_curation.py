"""Unit/property tests for corpus-curation operators and star-CC.

The registered queries are additionally hash-checked against their
DuckDB oracles by test_queries_vs_oracle.py; these tests pin the
operator laws that the oracle comparison can't express (sketch
one-sidedness, mergeability, CC equivalence on adversarial graphs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_airflow_spotify_spark.operators import curation as C
from etl_airflow_spotify_spark.operators import dedup as D


# -- connected components: star vs label propagation ------------------------

GRAPHS = {
    # label-prop needs diameter rounds on a chain; star must match it
    "chain": [(i, i + 1) for i in range(40)],
    "two_cliques": [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(100, 104) for b in range(a + 1, 104)],
    "star_shape": [(0, i) for i in range(1, 30)],
    "bridge": [(1, 2), (2, 3), (10, 11), (3, 10)],
    "self_dups": [(5, 6), (6, 5), (5, 6), (7, 7)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_cc_matches_label_propagation(spark, name):
    pairs = spark.createDataFrame(GRAPHS[name], "id_a: long, id_b: long")
    lp = {(r.id, r.cluster_id)
          for r in D.connected_components(pairs, max_iters=60).collect()}
    st = {(r.id, r.cluster_id)
          for r in D.connected_components_star(pairs).collect()}
    assert st == lp


def test_star_cc_empty(spark):
    pairs = spark.createDataFrame([], "id_a: long, id_b: long")
    assert D.connected_components_star(pairs).count() == 0


def test_star_cc_converges_on_long_chain_few_rounds(spark):
    """The point of star-CC: a 60-node chain converges well inside 25
    rounds (label propagation would need 60)."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                  "id_a: long, id_b: long")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # max_rounds warning -> failure
        out = D.connected_components_star(pairs, max_rounds=12).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == 61


# -- count-min sketch laws --------------------------------------------------


def _words(spark, rows):
    return spark.createDataFrame([(w,) for w in rows], "item: string")


def test_count_min_estimate_is_upper_bound(spark):
    corpus = ["a"] * 50 + ["b"] * 20 + [f"w{i}" for i in range(300)]
    items = _words(spark, corpus)
    sketch = C.count_min_table(items, "item", depth=4, width=64)
    probes = _words(spark, ["a", "b", "w0", "w299"])
    est = {r.item: r.est for r in
           C.count_min_estimate(sketch, probes, "item", depth=4, width=64)
           .collect()}
    true = {"a": 50, "b": 20, "w0": 1, "w299": 1}
    for w, t in true.items():
        assert est[w] >= t, f"CMS under-estimated {w}: {est[w]} < {t}"
    # width=64 over ~320 distinct items: the heavy hitter stays close
    assert est["a"] <= 50 + len(corpus) // 64 * 4


def test_count_min_sketch_merges_by_union_resum(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ++ B) — the property that
    lets 100 TB shards sketch independently and roll up."""
    a = ["x"] * 10 + ["y"] * 3 + ["z"]
    b = ["x"] * 5 + ["q"] * 7
    sa = C.count_min_table(_words(spark, a), "item", depth=4, width=32)
    sb = C.count_min_table(_words(spark, b), "item", depth=4, width=32)
    merged = (sa.unionByName(sb).groupBy("d", "w")
              .agg(F.sum("cnt").alias("cnt")))
    direct = C.count_min_table(_words(spark, a + b), "item",
                               depth=4, width=32)
    assert ({tuple(r) for r in merged.collect()}
            == {tuple(r) for r in direct.collect()})


# -- decontamination --------------------------------------------------------


def test_ngram_contamination_planted(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "totally unrelated content here now"),
         (3, "quick brown fox somewhere else")],
        "doc_id: long, text: string")
    ev = spark.createDataFrame(
        [(100, "a quick brown fox appeared")],
        "doc_id: long, text: string")
    out = {r.doc_id: (r.n_shared_ngrams, r.n_eval_docs)
           for r in C.ngram_contamination(train, ev, "doc_id", "text", n=3)
           .collect()}
    # docs 1 and 3 share the 3-gram "quick brown fox"; doc 2 is clean
    assert set(out) == {1, 3}
    assert out[1] == (1, 1) and out[3] == (1, 1)


def test_ngram_contamination_short_docs_no_crash(spark):
    train = spark.createDataFrame([(1, "hi"), (2, "")],
                                  "doc_id: long, text: string")
    ev = spark.createDataFrame([(9, "hi")], "doc_id: long, text: string")
    out = C.ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    # "hi" == its own (clamped) 1-token "3-gram" on both sides
    assert {r.doc_id for r in out} == {1}


# -- PII redaction ----------------------------------------------------------


def test_pii_redact_and_count(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c_d@sub.example.com and 555-123-4567 plus "
             "123-45-6789 done"),
         (2, "clean text, no pii at all"),
         (3, "two mails: x@y.io z@w.co 999-88-7777")],
        "doc_id: long, text: string")
    counts = C.pii_counts(F.col("text"))
    out = df.select(
        "doc_id", counts["email"].alias("e"), counts["phone"].alias("p"),
        counts["ssn"].alias("s"), C.redact_pii(F.col("text")).alias("red"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert (rows[1].e, rows[1].p, rows[1].s) == (1, 1, 1)
    assert (rows[2].e, rows[2].p, rows[2].s) == (0, 0, 0)
    assert (rows[3].e, rows[3].p, rows[3].s) == (2, 0, 1)
    assert "[EMAIL]" in rows[1].red and "[PHONE]" in rows[1].red \
        and "[SSN]" in rows[1].red
    # redacted text must contain no remaining matches
    import re
    for r in out:
        for pat in (C.EMAIL_RE, C.PHONE_RE, C.SSN_RE):
            assert not re.search(pat, r.red)


# -- sequence packing -------------------------------------------------------


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (7 + i % 90))) for i in range(200)],
        "doc_id: long, text: string")
    packed = C.pack_sequences(docs, "doc_id", "text",
                              budget=100, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows:
            # contiguous concatenation: no gaps, no overlaps
            assert r.start_tok == pos
            assert r.first_seq == pos // 100
            assert r.last_seq == max(pos + r.n_tok - 1, pos) // 100
            pos += r.n_tok


# -- stratified sampling ----------------------------------------------------


def test_stratified_sample_deterministic_and_rate(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)],
        "doc_id: long, lang: string")
    kept = C.stratified_sample(df, "doc_id", "lang", {"en": 20})
    counts = {r.lang: r.n for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["xx"] == 1000            # default rate keeps all
    assert 120 <= counts["en"] <= 280      # ~20% of 1000, md5-binomial
    # pure function of id: re-running yields the identical membership
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in
            C.stratified_sample(df, "doc_id", "lang", {"en": 20}).collect()}
    assert ids1 == ids2


# -- incremental CDC fold law ------------------------------------------------


def _fold_cdc(spark, snapshot_rows, change_rows, batch_of):
    """Fold change slices (grouped by batch_of(row)) into the snapshot."""
    from etl_airflow_spotify_spark.operators.cdc import (
        cdc_apply_versioned, finalize_versioned, init_versioned)

    snap = spark.createDataFrame(snapshot_rows, "k: long, val: string")
    ch = spark.createDataFrame(
        change_rows, "k: long, seq: long, op: string, val: string")
    versioned = init_versioned(snap, ch, ["seq"])
    batches: dict[int, list] = {}
    for r in change_rows:
        batches.setdefault(batch_of(r), []).append(r)
    for b in sorted(batches):
        sl = spark.createDataFrame(
            batches[b], "k: long, seq: long, op: string, val: string")
        versioned = cdc_apply_versioned(versioned, sl, "k", ["seq"])
    return {(r.k, r.val) for r in
            finalize_versioned(versioned, ["seq"]).collect()}


def test_cdc_fold_order_independent(spark):
    """fold(slices) == one-shot, for adversarial slicings: newest-first,
    interleaved, and one-change-per-batch."""
    snapshot = [(1, "old1"), (2, "old2"), (3, "old3"), (4, "old4")]
    changes = [
        (1, 10, "U", "a"), (1, 20, "D", None), (1, 15, "U", "b"),
        (2, 5, "U", "x"), (2, 6, "U", "y"),
        (5, 7, "U", "new"), (5, 3, "D", None),
        (6, 1, "D", None),          # delete of a key never in snapshot
        (3, 9, "D", None), (3, 11, "U", "z"),  # resurrect after delete
    ]
    # one-shot truth: latest per key -> 1 deleted, 2->y, 3->z, 4 kept,
    # 5->new, 6 never exists
    expected = {(2, "y"), (3, "z"), (4, "old4"), (5, "new")}
    slicings = {
        "one_shot": lambda r: 0,
        "by_seq_desc": lambda r: -r[1],       # newest changes first
        "interleaved": lambda r: r[1] % 3,
        "singletons": lambda r: r[1],
    }
    for name, batch_of in slicings.items():
        got = _fold_cdc(spark, snapshot, changes, batch_of)
        assert got == expected, f"slicing {name!r}: {got} != {expected}"


def test_cdc_fold_idempotent_redelivery(spark):
    """Re-applying an already-applied slice must be a no-op (at-least-
    once delivery safety)."""
    from etl_airflow_spotify_spark.operators.cdc import (
        cdc_apply_versioned, finalize_versioned, init_versioned)

    snap = spark.createDataFrame([(1, "old")], "k: long, val: string")
    ch = spark.createDataFrame([(1, 10, "U", "new")],
                               "k: long, seq: long, op: string, val: string")
    v = init_versioned(snap, ch, ["seq"])
    v = cdc_apply_versioned(v, ch, "k", ["seq"])
    v = cdc_apply_versioned(v, ch, "k", ["seq"])  # redelivered
    assert {(r.k, r.val) for r in finalize_versioned(v, ["seq"]).collect()} \
        == {(1, "new")}


def test_ivm_fold_order_independent_with_retractions(spark):
    """Signed-multiplicity IVM law: fold(any slicing of the changelog)
    == one-shot aggregate, retractions cancel exactly (DECIMAL group
    op), and fully-retracted groups leave NO residue row."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.operators.ivm import (merge_state,
                                                         signed_partial)

    rows = [  # (group, weight, value); group 'b' fully retracts
        ("a", 1, 10.50), ("a", 1, 2.25), ("a", -1, 10.50),
        ("b", 1, 7.00), ("b", -1, 7.00),
        ("c", 1, 1.10), ("c", 1, 2.20),
    ]
    expected = {("a", 1, 2.25), ("c", 2, 3.30)}
    for name, batch_of in {"one_shot": lambda i: 0,
                           "reversed_pairs": lambda i: -(i // 2),
                           "singletons": lambda i: i}.items():
        batched = [(batch_of(i), g, w, v)
                   for i, (g, w, v) in enumerate(rows)]
        df = spark.createDataFrame(
            batched, "b: long, g: string, w: int, v: double")
        state = None
        for b in sorted({r[0] for r in batched}):
            part = signed_partial(df.filter(F.col("b") == b),
                                  ["g"], F.col("w"), F.col("v"))
            state = merge_state(state, part, ["g"])
        got = {(r["g"], r["_net_rows"], float(r["_net_val"]))
               for r in state.collect()}
        assert got == expected, f"slicing {name!r}: {got}"


def test_delta_join_full_retraction_nets_zero(spark):
    """Bilinear rule sanity: retracting every B row must cancel the
    view exactly (empty state, no residue)."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.operators.ivm import (delta_join_terms,
                                                         merge_state,
                                                         signed_partial)

    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, g string")
    b = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)],
                              "k long, v double")
    a_old, da = a, a.limit(0).withColumn("_wa", F.lit(1))
    db = b.withColumn("_wb", F.lit(-1))
    val = F.col("v").cast("decimal(18,6)")
    view = signed_partial(a_old.join(b, "k").withColumn("_w", F.lit(1)),
                          ["g"], F.col("_w"), val)
    delta = signed_partial(delta_join_terms(a_old, da, b, db, "k"),
                           ["g"], F.col("_w"), val)
    assert merge_state(view, delta, ["g"]).count() == 0
