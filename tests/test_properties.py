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
