"""Property-based invariants (SURVEY.md §5.3) over randomized inputs:
explode row accounting, left-join row preservation, dedup idempotence,
salted-join equivalence. Few examples per property — every example is a
full Spark job — but each draws fresh structure, which is what catches
the edge cases fixed fixtures bake around (empty arrays, duplicate
keys, all-rows-one-key skew)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# (album_id, n_tracks) pairs; n_tracks=0 exercises the empty-array edge
albums_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 5)),
    min_size=0, max_size=8, unique_by=lambda t: t[0])

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)),
    min_size=1, max_size=30)


@PROP
@given(albums=albums_strategy)
def test_explode_preserves_row_accounting(spark, albums):
    """Exploding nested tracks yields exactly sum(len(tracks)) rows and
    never invents or drops a parent key."""
    rows = [(aid, [f"t{aid}_{i}" for i in range(n)]) for aid, n in albums]
    df = spark.createDataFrame(rows, "album_id: long, tracks: array<string>")
    exploded = df.select("album_id", F.explode("tracks").alias("t"))
    assert exploded.count() == sum(n for _, n in albums)
    got_parents = {r.album_id for r in exploded.select("album_id").distinct().collect()}
    assert got_parents == {aid for aid, n in albums if n > 0}


@PROP
@given(pairs=pairs_strategy, keep=st.integers(0, 9))
def test_left_join_preserves_left_rows(spark, pairs, keep):
    """Left join against any (possibly empty, possibly duplicate-free)
    right side keeps exactly the left row count when the right side is
    unique on the key — the J1 semantics the reference relies on."""
    left = spark.createDataFrame(pairs, "k: long, v: long")
    right = (spark.createDataFrame([(k,) for k, _ in pairs if k <= keep],
                                   "k: long")
             .distinct().withColumn("tag", F.lit("x")))
    joined = left.join(right, "k", "left")
    assert joined.count() == len(pairs)


@PROP
@given(pairs=pairs_strategy)
def test_exact_dedup_idempotent(spark, pairs):
    """dropDuplicates twice == once, and output keys are exactly the
    distinct input keys."""
    df = spark.createDataFrame(pairs, "k: long, v: long")
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert once.count() == twice.count() == len({k for k, _ in pairs})


@PROP
@given(pairs=pairs_strategy, n_salts=st.integers(1, 8))
def test_salted_join_matches_plain_join(spark, pairs, n_salts):
    from etl_airflow_spotify_spark.operators.scale import salted_join

    big = spark.createDataFrame(pairs, "k: long, v: long")
    small = (spark.createDataFrame([(k,) for k, _ in pairs], "k: long")
             .distinct().withColumn("name", F.concat(F.lit("n"), F.col("k"))))
    plain = sorted((r.k, r.v, r.name)
                   for r in big.join(small, "k", "inner").collect())
    salted = sorted((r.k, r.v, r.name)
                    for r in salted_join(big, small, "k", n_salts).collect())
    assert salted == plain


# (key, group, value) base rows for IVM join-delta equivalence
ivm_base_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 2),
              st.integers(-50, 50)),
    min_size=0, max_size=12)
ivm_flags_strategy = st.lists(st.booleans(), min_size=12, max_size=12)


@PROP
@given(a_rows=ivm_base_strategy, b_rows=ivm_base_strategy,
       a_new=ivm_flags_strategy, b_del=ivm_flags_strategy)
def test_delta_join_equals_direct_recompute(spark, a_rows, b_rows,
                                            a_new, b_del):
    """Bilinear-rule law: view_old + d(AxB) == direct aggregate over
    (A_new x B_new), for ANY split of rows into base/arriving and
    kept/retracted. Integer values make equality exact."""
    from etl_airflow_spotify_spark.operators.ivm import (delta_join_terms,
                                                         merge_state,
                                                         signed_partial)

    a = [(k, g, v, bool(a_new[i % 12])) for i, (k, g, v) in enumerate(a_rows)]
    b = [(k, g, v, bool(b_del[i % 12])) for i, (k, g, v) in enumerate(b_rows)]
    adf = spark.createDataFrame(
        a or [(0, 0, 0, True)], "k long, g long, av long, is_new boolean")
    bdf = spark.createDataFrame(
        b or [(9, 0, 0, True)], "k long, g long, bv long, is_del boolean")
    bdf = bdf.drop("g")

    a_old = adf.filter(~F.col("is_new")).drop("is_new")
    da = adf.filter(F.col("is_new")).drop("is_new") \
            .withColumn("_wa", F.lit(1))
    b_old = bdf.drop("is_del")
    db = bdf.filter(F.col("is_del")).drop("is_del") \
            .withColumn("_wb", F.lit(-1))

    val = (F.col("av") * F.col("bv")).cast("decimal(18,6)")
    view_old = signed_partial(
        a_old.join(b_old, "k").withColumn("_w", F.lit(1)),
        ["g"], F.col("_w"), val)
    delta = signed_partial(delta_join_terms(a_old, da, b_old, db, "k"),
                           ["g"], F.col("_w"), val)
    inc = {(r.g): (r._net_rows, r._net_val)
           for r in merge_state(view_old, delta, ["g"]).collect()}

    direct_rows = (adf.drop("is_new")
                   .join(bdf.filter(~F.col("is_del")).drop("is_del"), "k"))
    direct = {(r.g): (r.n, r.s) for r in
              direct_rows.groupBy("g")
              .agg(F.count("*").cast("long").alias("n"),
                   F.sum(val).alias("s"))
              .collect() if r.n != 0}
    assert inc == direct


@PROP
@given(vals=st.lists(
    st.tuples(st.text(alphabet="abcd ", min_size=1, max_size=12),
              st.integers(1, 5)),
    min_size=0, max_size=10, unique_by=lambda t: t[0]))
def test_blocked_fuzzy_pairs_laws(spark, vals):
    """Every emitted pair respects the distance bound, is ordered
    (value_a < value_b), and carries weight n_a * n_b."""
    from etl_airflow_spotify_spark.operators.linkage import \
        blocked_fuzzy_pairs

    df = spark.createDataFrame(vals or [("zz", 1)], "nm string, n long")
    out = blocked_fuzzy_pairs(
        df, "nm", "n",
        [lambda c: F.substring(c, 1, 2)], max_dist=3).collect()
    weights = dict(((v, n) for v, n in (vals or [("zz", 1)])))
    for r in out:
        assert r.value_a < r.value_b
        assert r.edit_dist <= 3
        assert r.pair_weight == weights[r.value_a] * weights[r.value_b]


@PROP
@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30),
    min_size=1, max_size=6))
def test_repetition_metric_bounds(spark, texts):
    """0 <= top_word_frac <= 1, 0 <= dup_bigram_frac < 1, counts
    consistent, for arbitrary whitespace-noisy text."""
    from etl_airflow_spotify_spark.operators.text import repetition_metrics

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in repetition_metrics(docs, "doc_id", "text").collect():
        assert 0.0 < r.top_word_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        assert r.n_distinct <= r.n_words
        assert r.n_bigrams == max(r.n_words - 1, 0)


@PROP
@given(perm_seed=st.integers(0, 5))
def test_dup_ngram_coverage_order_independent(spark, perm_seed):
    """Corpus-wide duplicate marking cannot depend on document order or
    partitioning."""
    import random

    from etl_airflow_spotify_spark.operators.dedup import \
        duplicated_ngram_coverage

    base = [(1, "a b c d e f"), (2, "x y a b c d"), (3, "p q r s t u")]
    rng = random.Random(perm_seed)
    shuffled = base[:]
    rng.shuffle(shuffled)
    out1 = {(r.doc_id, r.n_dup) for r in duplicated_ngram_coverage(
        spark.createDataFrame(base, "doc_id long, text string"),
        "doc_id", "text", n=4).collect()}
    out2 = {(r.doc_id, r.n_dup) for r in duplicated_ngram_coverage(
        spark.createDataFrame(shuffled, "doc_id long, text string")
        .repartition(3), "doc_id", "text", n=4).collect()}
    assert out1 == out2
