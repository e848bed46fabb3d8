"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these ops at 100 TB):
  * No all-pairs comparison anywhere. Candidates come from LSH band
    buckets (MinHash/SimHash) or natural blocking keys; only candidates
    are verified with the exact measure.
  * Everything is JVM-side expressions (higher-order array functions +
    xxhash64) — no Python in the hot path, so signatures are computed
    inside whole-stage codegen during the scan.
  * The only shuffles are the band-bucket groupBys and the verify join,
    all on high-cardinality keys; AQE handles residual skew. Degenerate
    buckets (boilerplate text) can be capped via ``max_bucket`` before
    the self-join goes quadratic.

Determinism: xxhash64 (fixed seed) + fixed-seed universal-hash
coefficients make signatures stable across runs — required for the
driver's value-hash checks and for incremental dedup.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from ..caching import persist_tracked

from ..catalog import spread as _spread


# -- shingling --------------------------------------------------------------

def token_shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined) from a token array."""
    positions = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(positions, lambda i: F.array_join(F.slice(tokens, i, k), " "))
    )


def exploded_token_shingles(df: DataFrame, key_col: str, text_col: str,
                            k: int, spread_col: str | None = None,
                            out: str = "sg") -> DataFrame:
    """(key, shingle) rows with the tokenizer materialized BELOW a
    spread exchange and the shingle transform ABOVE it (r9
    optimization). Written as one projection, Catalyst's
    CollapseProject inlines split(text) into every element of the
    shingle lambda (O(tokens^2) per doc) and
    InferFiltersFromGenerate pushes a clone of the whole expression
    into the scan — the exchange pins the tokens as a materialized
    column, so the lambda and the inferred filter both reference it.
    ``spread_col`` lets low-cardinality keys (e.g. source) spread on a
    high-cardinality sibling instead."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    sc = spread_col or key_col
    cols = [F.col(key_col)] if sc == key_col else [F.col(key_col),
                                                   F.col(sc)]
    base = _spread(df.select(*cols, toks.alias("_toks")), sc)
    return base.select(F.col(key_col),
                       F.explode(token_shingles(F.col("_toks"), k))
                       .alias(out))


def char_ngrams(text: Column, n: int = 4) -> Column:
    """Distinct character n-grams of the text."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(positions, lambda i: text.substr(i, F.lit(n)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


# -- MinHash ----------------------------------------------------------------
#
# Aggregate formulation, NOT a num_hashes-wide array expression: a nested
# array_min-per-hash column looks natural, but Catalyst's project collapse
# inlines the whole signature expression into every band-key reference,
# exponentially duplicating work (observed 270s for 500 docs). Computing
# the signature as MIN aggregate columns keeps the plan linear — an
# Aggregate is not a Project, so its outputs are never inlined downstream.


def minhash_band_keys(shingled: DataFrame, id_col: str = "_id",
                      shingles_col: str = "shingles",
                      num_hashes: int = 64, bands: int = 16) -> DataFrame:
    """(id, shingle-set) -> (id, band, key) LSH bucket rows.

    Explode shingles; ONE xxhash64 per shingle, then the ``num_hashes``
    MinHash functions are derived by universal hashing (multiply-add mod
    2^61-1) — arithmetic per function instead of re-hashing the string.
    The wide MIN aggregate gets map-side partial aggregation, so the
    shuffle carries one ``num_hashes``-column row per document
    regardless of document size.
    """
    rows = num_hashes // bands
    # 2-universal hashing over the two 32-bit halves of one xxhash64 per
    # shingle, mod p = 2^61-1. Coefficients < 2^29 keep every
    # intermediate under 2^63 (Spark 4 runs ANSI mode: overflow THROWS).
    p = (1 << 61) - 1
    rng = random.Random(0x5EED)
    coef = [(rng.randrange(1, 1 << 29), rng.randrange(1, 1 << 29),
             rng.randrange(0, p)) for _ in range(num_hashes)]
    hi = F.shiftrightunsigned(F.col("base"), 32)
    lo = F.col("base").bitwiseAND(F.lit(0xFFFFFFFF))
    # One wide aggregate: num_hashes MIN columns in a single shuffle with
    # map-side combine — no per-hash row fan-out, and since an aggregate
    # is not a Project, Catalyst cannot inline the signature expressions
    # into their downstream band-key uses.
    sig = (
        _spread(shingled.select(F.col(id_col).alias("_id"),
                                F.col(shingles_col).alias("shingles")), "_id")
        .select("_id", F.explode("shingles").alias("s"))
        .select("_id", F.xxhash64("s").alias("base"))
        .groupBy("_id")
        .agg(*[
            F.min((F.lit(a) * hi + F.lit(b) * lo + F.lit(c)) % p).alias(f"mh{j}")
            for j, (a, b, c) in enumerate(coef)
        ])
    )
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(F.concat_ws(
                ",", *[F.col(f"mh{bi * rows + i}").cast("string")
                       for i in range(rows)])).alias("key"),
        )
        for bi in range(bands)
    ]
    return (
        sig.select("_id", F.explode(F.array(*band_structs)).alias("bk"))
        .select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def lsh_candidate_pairs(bucket_rows: DataFrame,
                        max_bucket: int | None = None) -> DataFrame:
    """(_id, band, key) bucket rows -> distinct candidate pairs
    (id_a < id_b) via self-join within each (band, key) bucket.
    ``max_bucket`` drops degenerate buckets (boilerplate content) before
    the within-bucket join goes quadratic."""
    # The bucket frame feeds both sides of the self-join (and the bucket
    # census when max_bucket is set); the alias-renamed projections
    # defeat exchange reuse, so persist it rather than recompute the
    # whole signature pipeline per consumer. It is bands-per-doc rows of
    # three scalars — small at any scale.
    e = persist_tracked(bucket_rows)
    if max_bucket is not None:
        counts = e.groupBy("band", "key").count().filter(F.col("count") <= max_bucket)
        e = e.join(counts.select("band", "key"), ["band", "key"], "left_semi")
    a = e.select(F.col("_id").alias("id_a"), "band", "key")
    b = e.select(F.col("_id").alias("id_b"), "band", "key")
    return (a.join(b, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())


def minhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            threshold: float = 0.8, shingle_k: int = 3,
                            num_hashes: int = 64, bands: int = 16,
                            max_bucket: int | None = None) -> DataFrame:
    """End-to-end near-dup detection: shingle -> MinHash -> band-bucket
    candidates -> exact-Jaccard verify. Returns (id_a, id_b, jaccard)
    for verified pairs with jaccard >= threshold.

    With 16 bands x 4 rows, P(miss) for a true pair at j=0.8 is
    (1 - 0.8^4)^16 ~ 2e-4, at j=0.9 ~ 2e-9; raise num_hashes/bands for
    tighter guarantees near the threshold. False positives cost only a
    verify comparison (they are filtered exactly).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # Spread BEFORE shingling: the tokenize/shingle projection is the
    # CPU-heavy stage, so it must run at full parallelism even when the
    # input file arrived as a single split.
    # The shingle frame feeds three subtrees (bucketing + both sides of
    # the verify join); persist it so the tokenize/shingle scan runs once.
    # MEMORY_AND_DISK: at 100 TB the shingle sets spill rather than OOM.
    shingled = persist_tracked(_spread(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id"
    ).select(
        "_id",
        token_shingles(toks, shingle_k).alias("shingles"),
    ))
    buckets = minhash_band_keys(shingled, num_hashes=num_hashes, bands=bands)
    cands = lsh_candidate_pairs(buckets, max_bucket=max_bucket)
    sh = shingled
    verified = (
        cands
        .join(sh.select(F.col("_id").alias("id_a"),
                        F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"),
                        F.col("shingles").alias("sh_b")), "id_b")
        .select("id_a", "id_b",
                F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


# -- SimHash ----------------------------------------------------------------

def with_simhash(df: DataFrame, text_col: str, out: str = "simhash",
                 shingle_k: int = 3) -> DataFrame:
    """Append a 64-bit SimHash packed into one BIGINT. Features are
    k-token shingles (NOT bare tokens: on corpora with a small shared
    vocabulary, token-level SimHash collapses to near-identical values
    for every document). Single-pass, JVM-side.

    Bit source is md5, not xxhash64: md5 is the one hash DuckDB and
    Spark share, which makes the whole signature — and therefore the
    banded near-dup pipeline on top of it — EXACTLY replayable by the
    SQL oracle. Bits 0-59 come from the first 15 hex chars
    (conv(...,16,10), the repo-wide 60-bit idiom), bits 60-63 from hex
    char 16.
    """
    toks = f"split(trim(lower({text_col})), '\\\\s+')"
    feats = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({toks}) - {shingle_k - 1}, 1)), "
        f"i -> array_join(slice({toks}, i, {shingle_k}), ' ')))"
    )
    # one md5 per feature, split into a 60-bit word + a 4-bit word
    hashed = (
        f"transform({feats}, t -> named_struct("
        f"'h1', CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT), "
        f"'h2', CAST(conv(substring(md5(t), 16, 1), 16, 10) AS BIGINT)))"
    )
    counts = (
        f"aggregate({hashed}, array_repeat(0, 64), (acc, s) -> "
        f"zip_with(acc, transform(sequence(0, 63), i -> "
        f"IF((shiftrightunsigned(IF(i < 60, s.h1, s.h2), "
        f"CAST(IF(i < 60, i, i - 60) AS INT)) & 1) = 1, 1, -1)), "
        f"(x, y) -> x + y))"
    )
    packed = (
        f"aggregate(zip_with({counts}, sequence(0, 63), (c, i) -> "
        f"IF(c > 0, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)), CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc | v)"
    )
    return df.withColumn(out, F.expr(packed))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            max_hamming: int = 6,
                            max_bucket: int | None = None) -> DataFrame:
    """SimHash near-dup: 4 bands of 16 bits generate candidates (a pair
    within hamming<=3 of 64 bits must agree on >=1 full band by
    pigeonhole when distance < 4; wider distances are caught with high
    probability), then exact hamming verification."""
    h = with_simhash(
        _spread(df.select(F.col(id_col).alias("_id"), text_col), "_id"),
        text_col)
    # The signature feeds both the bucketing and the verify join; persist
    # the (id, 64-bit hash) pairs so the heavy shingle-aggregate runs once.
    h = persist_tracked(h.select("_id", "simhash"))
    buckets = h.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftrightunsigned(F.col("simhash"), 16 * b)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for b in range(4)
        ])).alias("bk"),
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cands = lsh_candidate_pairs(buckets, max_bucket=max_bucket)
    sig = h.select("_id", "simhash")
    return (
        cands
        .join(sig.select(F.col("_id").alias("id_a"),
                         F.col("simhash").alias("sh_a")), "id_a")
        .join(sig.select(F.col("_id").alias("id_b"),
                         F.col("simhash").alias("sh_b")), "id_b")
        .select("id_a", "id_b",
                hamming64(F.col("sh_a"), F.col("sh_b")).cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# -- exact ------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str, fingerprint: Column) -> DataFrame:
    """Groups of rows sharing an exact fingerprint (hash-groupBy — the
    trivially-distributed dedup). Returns (fingerprint, n, keep_id)."""
    return (
        df.select(F.col(id_col).alias("_id"), fingerprint.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"), F.min("_id").alias("keep_id"))
    )


# -- incremental ------------------------------------------------------------
#
# The production 100 TB flow: the historical corpus's shingle sets and
# band buckets are built once and persisted (in practice: written to
# bucketed tables keyed by (band, key)); each new increment only
# computes ITS OWN signatures and joins them against the index —
# new-vs-corpus and new-vs-new pairs, never corpus-vs-corpus again.


def build_minhash_index(df: DataFrame, id_col: str, text_col: str,
                        shingle_k: int = 3, num_hashes: int = 64,
                        bands: int = 16) -> tuple[DataFrame, DataFrame]:
    """(shingles, bucket-rows) for a corpus — the persisted dedup index.
    Signatures are fixed-seed deterministic, so an index built today
    candidates correctly against increments hashed tomorrow."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    shingled = persist_tracked(_spread(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id"
    ).select(
        "_id", token_shingles(toks, shingle_k).alias("shingles"),
    ))
    buckets = persist_tracked(minhash_band_keys(shingled, num_hashes=num_hashes,
                                bands=bands))
    return shingled, buckets


def incremental_near_duplicates(index: tuple[DataFrame, DataFrame],
                                new_df: DataFrame, id_col: str,
                                text_col: str, threshold: float = 0.8,
                                shingle_k: int = 3, num_hashes: int = 64,
                                bands: int = 16) -> DataFrame:
    """Near-dup pairs introduced by an increment: each pair touches at
    least one new document (new-vs-corpus or new-vs-new); existing
    corpus-vs-corpus pairs are never recomputed. Equals the full run's
    output restricted to pairs involving a new id (asserted in tests).
    Ids must be unique across corpus and increment."""
    idx_sh, idx_bk = index
    new_sh, new_bk = build_minhash_index(new_df, id_col, text_col,
                                         shingle_k, num_hashes, bands)
    all_bk = idx_bk.unionByName(new_bk)
    a = new_bk.select(F.col("_id").alias("id_n"), "band", "key")
    b = all_bk.select(F.col("_id").alias("id_o"), "band", "key")
    cands = (a.join(b, ["band", "key"])
             .filter(F.col("id_n") != F.col("id_o"))
             .select(F.least("id_n", "id_o").alias("id_a"),
                     F.greatest("id_n", "id_o").alias("id_b"))
             .distinct())
    sh = idx_sh.unionByName(new_sh)
    return (
        cands
        .join(sh.select(F.col("_id").alias("id_a"),
                        F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"),
                        F.col("shingles").alias("sh_b")), "id_b")
        .select("id_a", "id_b",
                F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# -- clustering -------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over undirected near-dup pairs (id_a, id_b)
    by iterative min-label propagation: every node's label becomes the
    minimum of its own and its neighbors' labels until a fixpoint.
    Returns (id, cluster_id) where cluster_id = min id in the component
    — the canonical representative a dedup KEEP policy uses.

    Iterations needed = graph diameter; near-dup components are small
    dense cliques, so this converges in 2-3 rounds. The driver loop
    checks convergence with a cheap count; each round is two shuffles
    (join + min-aggregate) on the id key. For web-scale graphs swap in
    large-star/small-star — the interface stays (pairs) -> (id, cluster).
    """
    # localCheckpoint (not persist): persist caches DATA but the logical
    # plan still accumulates one join+agg layer per iteration, so
    # Catalyst re-analyzes an ever-deeper lineage each round and the
    # loop goes superlinear in planning time. Checkpointing truncates
    # the lineage: every iteration plans against a constant-depth plan.
    # (Executor-local checkpoint is fine: on executor loss the whole
    # driver job retries, which re-runs the loop from its input.)
    edges = pairs.select("id_a", "id_b")
    und = edges.unionByName(
        edges.select(F.col("id_b").alias("id_a"),
                     F.col("id_a").alias("id_b"))).localCheckpoint()
    labels = (und.select(F.col("id_a").alias("id")).distinct()
              .withColumn("lab", F.col("id")).localCheckpoint())
    changed = 0
    for _ in range(max_iters):
        neigh = (und.join(labels, und.id_a == labels.id)
                 .select(F.col("id_b").alias("id"), "lab"))
        # r10 (r9 verdict item 3): lazy checkpoint — the changed-count
        # join right below is the action that materializes it, folding
        # the former eager-checkpoint job into the convergence check
        # (one job per round instead of two; `new` has exactly one
        # consumer inside that job).
        new = (labels.select("id", "lab").unionByName(neigh)
               .groupBy("id").agg(F.min("lab").alias("lab"))
               .localCheckpoint(eager=False))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.lab") != F.col("o.lab")).count())
        labels = new
        if changed == 0:
            break
    if changed:
        # Unconverged labels over-keep documents downstream (a cluster
        # split in two keeps two "representatives") — never fail silently.
        import warnings
        warnings.warn(
            f"connected_components hit max_iters={max_iters} with "
            f"{changed} labels still changing (component diameter > "
            f"max_iters); labels are NOT a fixpoint — raise max_iters "
            f"or switch to large-star/small-star", RuntimeWarning,
            stacklevel=2)
    return labels.select("id", F.col("lab").alias("cluster_id"))


# Below this many surviving edges the star fixpoint finishes with an
# exact driver-side union-find instead of more distributed rounds
# (each of which costs four exchanges + a collect regardless of size).
# 200k edges is ~3 MB on the driver; the distributed rounds do the
# contraction first, so the gate is scale-safe by construction.
_CC_LOCAL_FINISH_EDGE_MAX = 200_000


def connected_components_star(pairs: DataFrame,
                              max_rounds: int = 25) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the web-scale path promised by ``connected_components``'
    docstring. Same contract: undirected (id_a, id_b) pairs in, (id,
    cluster_id = min id in component) out.

    Why it scales where min-label propagation doesn't: label propagation
    needs diameter-many rounds (a 10M-link chain needs 10M rounds);
    star operations HALVE tree heights each round, converging in
    O(log^2 n) rounds on any graph. Each round is two shuffles keyed by
    node id (groupBy min + join), both with map-side partial min, and
    the edge set only ever shrinks toward one star per component, so
    round cost decreases monotonically. localCheckpoint truncates the
    per-round lineage exactly as in the label-prop loop.

    large-star(u): connect every neighbor v > u to m = min(N(u) + {u})
    small-star(u): connect every neighbor v < u, and u, to
                   m = min(N-(u) + {u})
    Fixpoint = edges form a star per component rooted at its min id.
    """
    # Node universe BEFORE dropping self-loops: a node whose only pair
    # is (x, x) is still a singleton component (label-prop keeps it).
    nodes = (pairs.select(F.col("id_a").alias("id"))
             .unionByName(pairs.select(F.col("id_b").alias("id")))
             .distinct())
    # r10 (r9 verdict item 3, guide §2): checkpoints are LAZY and the
    # convergence-signature collect right after is the action that
    # materializes them — one job per round instead of two (eager
    # checkpoint + sig). Safe here because the lazily materialized
    # frame has exactly ONE consumer inside the sig job (the agg);
    # every other consumer runs later and reads the cached blocks.
    e = (pairs.select(F.least("id_a", "id_b").alias("u"),
                      F.greatest("id_a", "id_b").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=False))

    def _sym(ed: DataFrame) -> DataFrame:
        return ed.unionByName(ed.select(F.col("v").alias("u"),
                                        F.col("u").alias("v")))

    def _sig(ed: DataFrame):
        # order-insensitive edge-set fingerprint for convergence checks
        # (XOR aggregate: no overflow under ANSI, distinct edges only)
        row = ed.agg(F.count("*").alias("n"),
                     F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        return row["n"], row["h"]

    sig = _sig(e)
    if sig[0] == 0:
        return nodes.select("id", F.col("id").alias("cluster_id"))
    converged = False
    for _ in range(max_rounds):
        # large-star: m(u) joined back to u's STRICTLY LARGER neighbors;
        # m <= u < v, so (m, v) is already canonical u<v form. Stays
        # lazy — it is consumed exactly once by the small-star below, so
        # materializing it would only add a round-trip; one
        # localCheckpoint per ROUND keeps lineage constant-depth.
        sym = _sym(e)
        m = (sym.groupBy("u")
             .agg(F.min("v").alias("mn"))
             .select("u", F.least("mn", "u").alias("m")))
        large = (sym.join(m, "u").filter(F.col("v") > F.col("u"))
                 .select(F.col("m").alias("u"), "v")
                 .distinct())
        # small-star over edges directed larger->smaller: every u with
        # smaller neighbors N-, plus u itself, connects to min(N-).
        down = _sym(large).filter(F.col("v") < F.col("u"))
        m2 = down.groupBy("u").agg(F.min("v").alias("m"))
        e = (down.select("u", "v").unionByName(
                 m2.select("u", F.col("u").alias("v")))
             .join(m2, "u")
             .filter(F.col("v") != F.col("m"))
             .select(F.col("m").alias("u"), "v")
             .distinct().localCheckpoint(eager=False))
        new_sig = _sig(e)  # materializes the round's lazy checkpoint
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
        # r10 (guide §2, r9 verdict item 3): star rounds HALVE tree
        # heights, so after a round or two the edge set has contracted
        # from graph-sized to component-skeleton-sized — but each
        # further distributed round still costs four exchanges plus a
        # collect of pure scheduling overhead (measured: rounds 2-7 on
        # an already-15k-edge graph were ~0.7 s EACH at sf0.1). Once
        # the MEASURED count (already collected for the signature) is
        # below the gate, finish the fixpoint with an exact union-find
        # on the driver — O(n alpha(n)) over <= LOCAL_FINISH bounded
        # rows, same min-id labels by definition, and at any scale the
        # gate only fires after the distributed rounds have done the
        # contraction. The driver never sees a graph-sized frame.
        if new_sig[0] <= _CC_LOCAL_FINISH_EDGE_MAX:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            rows = e.collect()
            for row in rows:
                ru, rv = find(row[0]), find(row[1])
                if ru != rv:
                    parent[rv] = ru
            comp: dict = {}
            members: dict = {}
            for row in rows:
                for node in row:
                    r = find(node)
                    if node not in members.setdefault(r, set()):
                        members[r].add(node)
            for r, mem in members.items():
                comp[r] = min(mem)
            stars = [(comp[find(n)], n) for mem in members.values()
                     for n in mem if n != comp[find(n)]]
            e = e.sparkSession.createDataFrame(stars, e.schema) \
                if stars else e.limit(0)
            converged = True
            break
    if not converged:
        import warnings
        warnings.warn(
            f"connected_components_star hit max_rounds={max_rounds} "
            "without a stable edge set; labels may not be a fixpoint",
            RuntimeWarning, stacklevel=2)
    # fixpoint edges are stars (min, v): label leaves by their root,
    # roots (and self-loop-only singletons, via the node universe) by
    # themselves.
    return (e.select(F.col("v").alias("id"), F.col("u").alias("lab"))
            .unionByName(nodes.select("id", F.col("id").alias("lab")))
            .groupBy("id").agg(F.min("lab").alias("cluster_id")))


def duplicated_ngram_coverage(docs: DataFrame, id_col: str, text_col: str,
                              n: int = 8, digits: int = 4) -> DataFrame:
    """Per-document duplicated-text fraction via corpus-wide repeated
    n-gram instances — the distributed approximation of exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): a token position is 'duplicated' if the n-gram
    starting there occurs anywhere else in the corpus (any doc,
    including elsewhere in the same one).

    Dataflow: explode positional n-gram hashes (md5 of the joined
    window), count occurrences per hash, join the counts back, fold to
    per-doc (n_shingles, n_dup, dup_frac). Both the count aggregate and
    the join shuffle on the hash, so the join is co-partitioned with
    the aggregate output (exchange reuse, no extra shuffle of the big
    side) — and the count side is one row per distinct hash, so even a
    degenerate corpus-wide hot n-gram fans out counts, never rows.

    Docs shorter than ``n`` tokens carry zero shingles and report
    dup_frac 0.0 (left join keeps them).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # 60-bit md5 ints, not 32-char hex strings: the hash is the shuffle
    # key of BOTH the count aggregate and the join back, so key width
    # sets the shuffle byte volume (4x narrower as a BIGINT), and the
    # conv idiom keeps it exactly replayable in DuckDB.
    shingle_hashes = F.expr(
        f"CASE WHEN size(_toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> CAST(conv(substring(md5(array_join(slice(_toks, i, {n}), "
        f"' ')), 1, 15), 16, 10) AS BIGINT)) END")
    # Stage order matters twice here (r9 optimization, guide §2.3/§4):
    # (a) tokenize BELOW the spread exchange and hash ABOVE it, so the
    # lambda references the materialized _toks column — projected into
    # one Project, Catalyst inlines the split() into every transform
    # element (O(tokens^2) per doc, measured 10x);
    # (b) persist the hash-array frame: it feeds two consumers (count
    # aggregate + join probe), and InferFiltersFromGenerate clones the
    # generator input into a size()>0 filter that predicate pushdown
    # would otherwise inline below the exchange — against the cache the
    # inferred filter tests the stored array, not a re-evaluation.
    d_tok = _spread(docs.select(F.col(id_col), toks.alias("_toks")),
                    id_col)
    hs = persist_tracked(
        d_tok.select(id_col, shingle_hashes.alias("_hs")))
    sh = hs.select(id_col, F.explode("_hs").alias("_h"))
    counts = sh.groupBy("_h").agg(F.count("*").alias("_c"))
    per_doc = (sh.join(counts, "_h")
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_shingles"),
                    F.sum((F.col("_c") >= 2).cast("int")).cast("long")
                    .alias("n_dup")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
                F.when(F.coalesce("n_shingles", F.lit(0)) > 0,
                       F.round(F.col("n_dup") / F.col("n_shingles"), digits))
                .otherwise(F.lit(0.0)).alias("dup_frac")))
