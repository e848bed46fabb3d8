"""Reproducible dataset splitting/sampling for training pipelines.

``df.sample``/``sampleBy`` draw per-row randoms whose outcome depends on
partition layout, so rerunning after a repartition (or at a different
cluster size) silently reassigns rows — poison for train/val/test
hygiene. The production-safe pattern is CONTENT-keyed hashing: a row's
split is a pure function of its id, stable across runs, engines,
partitionings, and incremental reprocessing. md5 is used (not
xxhash64/crc32) precisely because every engine agrees on it — the same
property that lets DuckDB hash-check the assignment here.

The reference has no sampling ([EXT]; its whole dataset is <=2,500 rows,
/root/reference/scripts/extract.py:109,155).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register

TRAIN_PCT, VAL_PCT = 80, 10  # remainder -> test


def hash_bucket(col: F.Column, n: int = 100) -> F.Column:
    """Deterministic [0, n) bucket from a key column: first 15 hex chars
    of md5 (60 bits, fits signed int64) mod n. Engine-portable."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
             .cast("long") % n)


def assign_split(df: DataFrame, key: str) -> DataFrame:
    b = hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < TRAIN_PCT, "train")
         .when(b < TRAIN_PCT + VAL_PCT, "val")
         .otherwise("test"))


@register(
    "dataset_split",
    f"""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN b < {TRAIN_PCT} THEN 'train'
                    WHEN b < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 AS b
              FROM documents)
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM assigned GROUP BY lang, split
    """,
    doc="80/10/10 train/val/test split of documents by md5(doc_id) "
        "bucket — reproducible under any repartitioning, engine, or "
        "incremental re-run, unlike rand()-based sample(). The id_sum "
        "column pins the EXACT per-document assignment in the hash "
        "check, not just the stratum sizes.",
    tags=("X2", "X14"),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (assign_split(d, "doc_id")
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("id_sum")))


GROUP_SAMPLE_K = 20


def group_sample(df: DataFrame, group_col: str, key: str,
                 k: int) -> DataFrame:
    """Keep a deterministic uniform sample of exactly min(k, |group|)
    rows per group: rank rows inside each group by md5(key) — a pure
    function of the row, so membership is stable across runs, engines
    and repartitioning, and APPENDING rows only ever swaps members in/
    out by hash order (no global reshuffle of the sample). This is the
    reproducible replacement for per-group reservoir sampling: one
    window shuffle on the group key, no RNG state, no driver loop."""
    w_ = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15),
                16, 10).cast("long")
    from pyspark.sql import Window
    win = Window.partitionBy(group_col).orderBy(w_.asc(), F.col(key).asc())
    return (df.withColumn("rk", F.row_number().over(win).cast("long"))
            .filter(F.col("rk") <= k))


@register(
    "per_group_sample",
    f"""
    SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {GROUP_SAMPLE_K}
    """,
    doc=f"Exactly-{GROUP_SAMPLE_K}-per-language uniform document sample "
        "chosen by md5(doc_id) rank — the deterministic replacement for "
        "per-group reservoir sampling (inspection samples, eval slices, "
        "per-domain spot checks). Membership is a pure function of the "
        "row id: re-runs, engines and repartitionings agree, and the "
        "oracle hash-checks the EXACT member set, not just counts. One "
        "window shuffle on the group key; at 100 TB group count, not "
        "data size, bounds the output.",
    tags=("X10", "X12", "X28"),
)
def per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (group_sample(d, "lang", "doc_id", GROUP_SAMPLE_K)
            .select("lang", "doc_id", "rk"))


@register(
    "quality_weighted_sample",
    """
    WITH scored AS (
        SELECT doc_id, lang,
               LEAST(len(string_split_regex(trim(lower(text)), '\\s+')),
                     1000) AS w,
               ('0x' || substr(md5('qws:' || CAST(doc_id AS VARCHAR)),
                               1, 15))::BIGINT % 1000 AS u
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(w) AS BIGINT) AS weight_kept
    FROM scored WHERE u < w
    GROUP BY lang
    """,
    doc="Deterministic QUALITY-WEIGHTED corpus sampling: each doc is "
        "kept with probability w/1000 where w = its (capped) token "
        "count — the importance-sampling step that upweights long/"
        "high-quality documents in a training mix. The keep decision "
        "is a pure scan predicate on md5(doc_id) (same u across runs, "
        "engines, and appends — unlike rand()-based sampling), so "
        "membership is exactly replayable: id_sum pins the precise "
        "kept set, not just counts.",
    tags=("X28", "X2", "X14"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = F.least(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")),
                F.lit(1000))
    u = (F.expr("CAST(conv(substring(md5(concat('qws:', "
                "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
         % 1000)
    return (d.select("doc_id", "lang", w.alias("w"), u.alias("u"))
            .filter(F.col("u") < F.col("w"))
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("id_sum"),
                 F.sum("w").cast("long").alias("weight_kept")))


# --------------------------------------------------------------------------
# X106: weighted bottom-k sampling WITHOUT replacement — the exact-k
# companion to quality_weighted_sample's Bernoulli keep: every document
# enters a hash race with ticket count proportional to its (capped)
# length, its key is the MIN ticket hash, and the global bottom-k keys
# win. Selection probability rises with weight, the sample size is
# exactly k, and — because tickets are md5 integers — the whole draw
# is a pure function of ids: engines, re-runs and appends agree
# bit-for-bit (no rand(), no log-of-float Efraimidis keys whose libm
# ulps could swap near-ties). Ticket fan-out is bounded (<= 64/doc),
# map-only; the race is one bottom-k.
# --------------------------------------------------------------------------
WTS_K = 200
WTS_DIV = 50   # one extra ticket per 50 words
WTS_MAX = 63   # ticket cap


@register(
    "weighted_bottomk_sample",
    f"""
    WITH w AS (
        SELECT doc_id, lang,
               1 + LEAST(len(string_split_regex(trim(lower(text)),
                                                '\\s+')) // {WTS_DIV},
                         {WTS_MAX}) AS n_tickets
        FROM documents
    ),
    keys AS (
        SELECT doc_id, lang, n_tickets,
               MIN(('0x' || substr(md5('wts:' || CAST(doc_id AS VARCHAR)
                                       || ':' || CAST(g.t AS VARCHAR)),
                                   1, 15))::BIGINT) AS race_key
        -- constant series + filter: DuckDB's generate_series cannot
        -- take a correlated column bound
        FROM w, generate_series(0, {WTS_MAX}) AS g(t)
        WHERE g.t < n_tickets
        GROUP BY doc_id, lang, n_tickets
    )
    SELECT doc_id, lang, CAST(n_tickets AS BIGINT) AS n_tickets,
           race_key, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY race_key, doc_id) AS rn
          FROM keys)
    WHERE rn <= {WTS_K}
    """,
    doc=f"X106 weighted bottom-k sampling: exactly {WTS_K} documents "
        "drawn with probability increasing in (capped) length via an "
        "integer md5 ticket race — 1 + words/50 tickets each (max 64), "
        "key = min ticket hash, keep the global bottom-k. Pure integer "
        "keys make the draw engine- and re-run-stable where float "
        "exponential-race keys are one libm ulp from flipping. The "
        "exact-size weighted-subset primitive for corpus mixing and "
        "eval-slice construction.",
    tags=("X106", "X28", "X12", "X14"),
)
def weighted_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    nt = (F.lit(1)
          + F.least(F.expr(f"size(split(trim(lower(text)), '\\\\s+')) "
                           f"DIV {WTS_DIV}"), F.lit(WTS_MAX)))
    w = d.select("doc_id", "lang", nt.alias("n_tickets"))
    keys = (w.select("doc_id", "lang", "n_tickets",
                     F.explode(F.sequence(F.lit(0),
                                          F.col("n_tickets") - 1))
                     .alias("t"))
            .select("doc_id", "lang", "n_tickets",
                    F.conv(F.substring(F.md5(F.concat_ws(
                        "", F.lit("wts:"), F.col("doc_id").cast("string"),
                        F.lit(":"), F.col("t").cast("string"))), 1, 15),
                        16, 10).cast("long").alias("h"))
            .groupBy("doc_id", "lang", "n_tickets")
            .agg(F.min("h").alias("race_key")))
    # Distributed bottom-k FIRST (TakeOrdered: per-partition heaps, no
    # global sort), THEN rank the K survivors — a global-order
    # row_number window would serialize the corpus through one
    # partition at scale.
    topk = keys.orderBy(F.asc("race_key"), F.asc("doc_id")).limit(WTS_K)
    rn = F.row_number().over(Window.orderBy(F.asc("race_key"),
                                            F.asc("doc_id")))
    return (topk.withColumn("rn", rn)
            .select("doc_id", "lang",
                    F.col("n_tickets").cast("long").alias("n_tickets"),
                    "race_key", F.col("rn").cast("long").alias("rank")))


# --------------------------------------------------------------------------
# X148: proportional apportionment by largest remainder (Hamilton's
# method) — the exact-integer answer to "split this sampling budget
# across strata proportionally": floor the quotas, then hand the
# leftover seats to the largest remainders (ties broken by stratum
# size then name — fully deterministic). All arithmetic is BIGINT
# (quota numerator seats*n_s, integer DIV/MOD against the corpus
# total); the remainder ranking is a window over the STRATUM table
# (group cardinality, never rows). Hamilton satisfies the quota
# property — every stratum gets floor(quota) or ceil(quota) —
# law-tested along with the exact-sum invariant.
# --------------------------------------------------------------------------
APPORTION_SEATS = 1000


def _apportion_oracle_sql() -> str:
    return f"""
    WITH strata AS (
        SELECT lang || '/' || source AS stratum,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM strata),
    quotas AS (
        SELECT stratum, n_docs,
               {APPORTION_SEATS} * n_docs // tot.n AS floor_seats,
               {APPORTION_SEATS} * n_docs % tot.n AS rem
        FROM strata CROSS JOIN tot
    ),
    leftover AS (
        SELECT {APPORTION_SEATS} - CAST(SUM(floor_seats) AS BIGINT)
                   AS k
        FROM quotas
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, n_docs DESC,
                                              stratum) AS rk
        FROM quotas
    )
    SELECT stratum, n_docs,
           CAST(floor_seats AS BIGINT) AS floor_seats,
           CAST(rem AS BIGINT) AS remainder_num,
           CAST(CASE WHEN rk <= (SELECT k FROM leftover)
                     THEN 1 ELSE 0 END AS BIGINT) AS extra,
           CAST(floor_seats + CASE WHEN rk <= (SELECT k FROM leftover)
                                   THEN 1 ELSE 0 END AS BIGINT)
               AS seats
    FROM ranked
    """


@register(
    "stratum_seat_apportionment",
    _apportion_oracle_sql(),
    doc=f"X148 Hamilton largest-remainder apportionment of "
        f"{APPORTION_SEATS} sample seats across (lang, source) "
        "strata: BIGINT quota numerators with integer DIV/MOD, "
        "leftover seats to the largest remainders with deterministic "
        "tie-breaks. Exact-sum and quota-property laws pinned. The "
        "allocation step every stratified sampling budget needs "
        "before the per-stratum draw.",
    tags=("X148", "X28", "X10", "X7"),
)
def stratum_seat_apportionment(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    strata = (d.groupBy(F.concat_ws("/", "lang", "source")
                        .alias("stratum"))
              .agg(F.count("*").cast("long").alias("n_docs")))
    tot = strata.agg(F.sum("n_docs").cast("long").alias("n"))
    quotas = (strata.crossJoin(F.broadcast(tot))
              .select("stratum", "n_docs",
                      F.expr(f"{APPORTION_SEATS} * n_docs div n")
                      .alias("floor_seats"),
                      F.expr(f"{APPORTION_SEATS} * n_docs % n")
                      .alias("rem")))
    k = APPORTION_SEATS - quotas.agg(
        F.sum("floor_seats")).collect()[0][0]
    w = Window.orderBy(F.desc("rem"), F.desc("n_docs"), F.asc("stratum"))
    return (quotas.withColumn("rk", F.row_number().over(w))
            .select("stratum", "n_docs",
                    F.col("floor_seats").cast("long"),
                    F.col("rem").cast("long").alias("remainder_num"),
                    F.when(F.col("rk") <= k, 1).otherwise(0)
                    .cast("long").alias("extra"),
                    (F.col("floor_seats")
                     + F.when(F.col("rk") <= k, 1).otherwise(0))
                    .cast("long").alias("seats")))


# --------------------------------------------------------------------------
# X182: Neyman-allocation stratified sampling — survey sampling's
# optimal design (allocate n_h proportional to N_h * sd_h, so noisy
# strata get more budget) followed by the content-keyed md5 draw
# this module is built on. Exactness: per-stratum variance comes
# from ONE exact BIGINT moment fold over acctbal cents
# (N*s2 - s1^2 identical integers), sd is one correctly-rounded
# sqrt of identical doubles, the Neyman weight N_h * sd_h snaps to
# the micro grid, and the allocation is Hamilton largest-remainder
# entirely in BIGINT arithmetic (the X148 machinery: floor quotas
# via integer DIV, leftovers to the largest integer remainders,
# segment-name ties). The sample itself is the md5 bottom-n_h rank
# per stratum; the emitted per-stratum key/cents checksums make the
# 500 sampled rows hash-checkable without shipping them.
# --------------------------------------------------------------------------
NEYMAN_N = 500


@register(
    "neyman_stratified_sample",
    f"""
    WITH base AS (
        SELECT c_custkey, c_mktsegment AS segment,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer
    ),
    mom AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_pop,
               CAST(SUM(cents) AS BIGINT) AS s1,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM base GROUP BY segment
    ),
    wgt AS (
        SELECT segment, n_pop,
               SQRT(CAST(n_pop * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n_pop AS DOUBLE) * (n_pop - 1))) AS sd,
               CAST(ROUND(n_pop * SQRT(
                        CAST(n_pop * s2 - s1 * s1 AS DOUBLE)
                        / (CAST(n_pop AS DOUBLE) * (n_pop - 1)))
                    * 1000000, 0) AS BIGINT) AS wm
        FROM mom
    ),
    tot AS (SELECT CAST(SUM(wm) AS BIGINT) AS w FROM wgt),
    quota AS (
        SELECT segment, n_pop, sd, wm,
               ({NEYMAN_N} * wm) // tot.w AS base_n,
               {NEYMAN_N} * wm - (({NEYMAN_N} * wm) // tot.w) * tot.w
                   AS rem
        FROM wgt CROSS JOIN tot
    ),
    left_ AS (
        SELECT {NEYMAN_N} - CAST(SUM(base_n) AS BIGINT) AS k FROM quota
    ),
    alloc AS (
        SELECT segment, n_pop, sd,
               CAST(base_n + CASE WHEN rnk <= left_.k THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_n
        FROM (SELECT q.*, ROW_NUMBER() OVER (ORDER BY rem DESC, segment)
                     AS rnk
              FROM quota q)
        CROSS JOIN left_
    ),
    ranked AS (
        SELECT b.segment, b.c_custkey, b.cents,
               ROW_NUMBER() OVER (
                   PARTITION BY b.segment
                   ORDER BY md5('ney:' || b.c_custkey), b.c_custkey)
                   AS rn
        FROM base b
    ),
    samp AS (
        SELECT r.segment,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(r.c_custkey) AS BIGINT) AS samp_key_sum,
               CAST(SUM(r.cents) AS BIGINT) AS samp_cents_sum
        FROM ranked r JOIN alloc a ON a.segment = r.segment
        WHERE r.rn <= a.alloc_n
        GROUP BY r.segment
    )
    SELECT a.segment, a.n_pop, ROUND(a.sd, 4) AS sd_cents, a.alloc_n,
           COALESCE(s.n_sampled, 0) AS n_sampled,
           COALESCE(s.samp_key_sum, 0) AS samp_key_sum,
           COALESCE(s.samp_cents_sum, 0) AS samp_cents_sum
    FROM alloc a LEFT JOIN samp s ON s.segment = a.segment
    ORDER BY a.segment
    """,
    doc=f"X182 Neyman stratified sampling: per-stratum sd from one "
        "exact BIGINT moment fold, weight N_h*sd_h micro-snapped, "
        f"Hamilton largest-remainder allocation of {NEYMAN_N} in pure "
        "integer arithmetic, md5 bottom-n_h content-keyed draw; "
        "per-stratum checksums make the sample hash-checkable.",
    tags=("X182", "X28", "X148", "X106", "X7"),
)
def neyman_stratified_sample(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long")
        .alias("cents"))
    mom = base.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("long")
        .alias("s2"))
    sd = F.sqrt((F.col("n_pop") * F.col("s2")
                 - F.col("s1") * F.col("s1")).cast("double")
                / (F.col("n_pop").cast("double")
                   * (F.col("n_pop") - 1)))
    wgt = mom.select("segment", "n_pop", sd.alias("sd"),
                     F.round(F.col("n_pop") * sd * 1e6, 0)
                     .cast("long").alias("wm"))
    tot = wgt.agg(F.sum("wm").cast("long").alias("w"))
    quota = (wgt.crossJoin(F.broadcast(tot))
             .select("segment", "n_pop", "sd", "wm",
                     F.expr(f"({NEYMAN_N} * wm) DIV w").alias("base_n"),
                     F.expr(f"{NEYMAN_N} * wm"
                            f" - (({NEYMAN_N} * wm) DIV w) * w")
                     .alias("rem")))
    leftk = quota.agg((F.lit(NEYMAN_N)
                       - F.sum("base_n")).cast("long").alias("k"))
    wr = Window.orderBy(F.desc("rem"), F.asc("segment"))
    alloc = (quota.withColumn("rnk", F.row_number().over(wr))
             .crossJoin(F.broadcast(leftk))
             .select("segment", "n_pop", "sd",
                     (F.col("base_n")
                      + F.when(F.col("rnk") <= F.col("k"), 1)
                      .otherwise(0)).cast("long").alias("alloc_n")))
    ws = Window.partitionBy("segment").orderBy(
        F.md5(F.concat(F.lit("ney:"),
                       F.col("c_custkey").cast("string"))),
        F.asc("c_custkey"))
    ranked = base.withColumn("rn", F.row_number().over(ws))
    samp = (ranked.join(alloc.select("segment", "alloc_n"), "segment")
            .filter(F.col("rn") <= F.col("alloc_n"))
            .groupBy("segment")
            .agg(F.count("*").cast("long").alias("n_sampled"),
                 F.sum("c_custkey").cast("long").alias("samp_key_sum"),
                 F.sum("cents").cast("long").alias("samp_cents_sum")))
    return (alloc.join(samp, "segment", "left")
            .select("segment", "n_pop", F.round("sd", 4)
                    .alias("sd_cents"), "alloc_n",
                    F.coalesce("n_sampled", F.lit(0)).cast("long")
                    .alias("n_sampled"),
                    F.coalesce("samp_key_sum", F.lit(0)).cast("long")
                    .alias("samp_key_sum"),
                    F.coalesce("samp_cents_sum", F.lit(0)).cast("long")
                    .alias("samp_cents_sum"))
            .orderBy("segment"))


# --------------------------------------------------------------------------
# X230: group-aware split assignment — the leakage-safe form of the
# train/valid/test split. Row-level hashing (dataset_split, X28-family)
# scatters one user's events across splits, leaking per-user signal
# from train into test; the production fix keys the split on the GROUP
# (user_id) so every row of a group lands in the same fold. This query
# assigns both ways and audits the difference: per scenario, the rows /
# groups per split, the achieved train fraction (group sizes are
# lumpy, so the grouped scenario deviates from 80/10/10 at the row
# level — that deviation is the price of hygiene), and the number of
# straddling groups (>1 split), provably 0 for the grouped scenario.
# The reference splits nothing ([EXT]); cf. Kaufman et al., "Leakage
# in data mining" (TKDD 2012) for the grouped-split discipline.
# --------------------------------------------------------------------------
def _gsplit_oracle_sql() -> str:
    def bucket(expr: str, salt: str) -> str:
        return (f"CAST(('0x' || substr(md5(concat('{salt}:', "
                f"CAST({expr} AS VARCHAR))), 1, 15)) AS BIGINT) % 10")

    def split_case(b: str) -> str:
        return (f"CASE WHEN ({b}) < 8 THEN 'train' "
                f"WHEN ({b}) = 8 THEN 'valid' ELSE 'test' END")

    return f"""
    WITH assigned AS (
        SELECT 'group' AS scenario, user_id,
               {split_case(bucket('user_id', 'gsplit'))} AS split
        FROM events
        UNION ALL
        SELECT 'row' AS scenario, user_id,
               {split_case(bucket('event_id', 'rsplit'))} AS split
        FROM events
    ),
    per_split AS (
        SELECT scenario, split,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups
        FROM assigned GROUP BY scenario, split
    ),
    straddle AS (
        SELECT scenario,
               CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_straddle_groups
        FROM (SELECT scenario, user_id,
                     COUNT(DISTINCT split) AS n_splits
              FROM assigned GROUP BY scenario, user_id)
        GROUP BY scenario
    ),
    tot AS (
        SELECT scenario, SUM(n_rows) AS all_rows FROM per_split
        GROUP BY scenario
    )
    SELECT p.scenario, p.split, p.n_rows, p.n_groups,
           CAST((p.n_rows * 1000000) // t.all_rows AS BIGINT)
               AS row_frac_micro,
           s.n_straddle_groups
    FROM per_split p
    JOIN tot t ON t.scenario = p.scenario
    JOIN straddle s ON s.scenario = p.scenario
    """


@register(
    "group_split_assignment",
    _gsplit_oracle_sql(),
    doc="X230 group-aware split assignment: events split 80/10/10 two "
        "ways — keyed on md5(user_id) (grouped, leakage-safe) vs "
        "md5(event_id) (row-level) — then audited per scenario x "
        "split: rows, groups touched, achieved row fraction (micro "
        "grid), and straddling groups (appearing in >1 split). The "
        "grouped scenario's straddle count is 0 by construction (law "
        "test); the row scenario's is the leakage the grouped split "
        "buys out of. Pure hash-classify + two aggregates — "
        "scale-free, no shuffle beyond the groupBys.",
    tags=("X230", "X28", "X65", "X7"),
)
def group_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def bucket(col: str, salt: str) -> F.Column:
        return (F.expr(
            f"CAST(conv(substring(md5(concat('{salt}:', "
            f"CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT)") % 10)

    def split_of(b: F.Column) -> F.Column:
        return (F.when(b < 8, "train")
                .when(b == 8, "valid").otherwise("test"))

    grouped = ev.select(
        F.lit("group").alias("scenario"), "user_id",
        split_of(bucket("user_id", "gsplit")).alias("split"))
    rowwise = ev.select(
        F.lit("row").alias("scenario"), "user_id",
        split_of(bucket("event_id", "rsplit")).alias("split"))
    assigned = grouped.unionByName(rowwise)
    per_split = (assigned.groupBy("scenario", "split")
                 .agg(F.count("*").cast("long").alias("n_rows"),
                      F.countDistinct("user_id").cast("long")
                      .alias("n_groups")))
    straddle = (assigned.groupBy("scenario", "user_id")
                .agg(F.countDistinct("split").alias("n_splits"))
                .groupBy("scenario")
                .agg(F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
                     .cast("long").alias("n_straddle_groups")))
    tot = (per_split.groupBy("scenario")
           .agg(F.sum("n_rows").alias("all_rows")))
    return (per_split
            .join(tot, "scenario")
            .join(straddle, "scenario")
            .select("scenario", "split", "n_rows", "n_groups",
                    F.expr("(n_rows * 1000000) DIV all_rows")
                    .cast("long").alias("row_frac_micro"),
                    "n_straddle_groups"))


# --------------------------------------------------------------------------
# X258: Horvitz-Thompson estimation under probability-proportional-to-
# size sampling — the UNEQUAL-probability estimator the sampling
# family lacks: X106 races weighted tickets for a FIXED-k sample,
# X182 allocates strata; PPS+HT is how a 100 TB pipeline estimates a
# total from a cheap biased sample with zero bias: include order i
# w.p. pi_i ∝ its size (capped at 1), estimate the total as
# sum(x_i / pi_i) over the sample. Inclusion coins are md5-derived on
# the micro grid, so both engines draw the IDENTICAL sample; the HT
# fold is BIGINT floor division; per-region rows compare the estimate
# against the exact total (|err| in permille, integer-safe — no
# negative floor-division, the DuckDB-floors-Spark-truncates trap).
# Horvitz & Thompson, JASA 1952; [EXT].
# --------------------------------------------------------------------------
HT_PI_DIVISOR = 200  # pi_micro = min(1e6, cents/200): $2M+ certain


@register(
    "horvitz_thompson_regions",
    f"""
    WITH o AS (
        SELECT r.r_name AS region,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
               (('0x' || substr(md5('ht:' ||
                   CAST(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT)
                   % 1000000 AS coin
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    p AS (
        SELECT region, cents, coin,
               LEAST(1000000, cents // {HT_PI_DIVISOR}) AS pi_micro
        FROM o
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS true_cents,
           CAST(SUM(CASE WHEN coin < pi_micro THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN coin < pi_micro
                    THEN (cents * 1000000) // pi_micro ELSE 0 END)
                AS BIGINT) AS ht_est_cents,
           CAST((ABS(SUM(CASE WHEN coin < pi_micro
                         THEN (cents * 1000000) // pi_micro ELSE 0 END)
                     - SUM(cents)) * 1000) // SUM(cents) AS BIGINT)
               AS abs_err_permille
    FROM p GROUP BY region
    """,
    doc="X258 Horvitz-Thompson total estimation under PPS sampling: "
        f"pi_micro = min(1e6, order-cents/{HT_PI_DIVISOR}) (orders of "
        "$2M+ certain; ~7% sampled at TPC-H prices), md5 micro-coins draw the identical sample "
        "in both engines, HT fold sum(x/pi) in BIGINT floor division; "
        "per-region exact total vs estimate with |err| permille "
        "(ABS before the floor division — negative integer division "
        "diverges across engines). The unbiased unequal-probability "
        "estimator next to X106/X182. Python replay + unbiasedness + "
        "certainty-stratum laws.",
    tags=("X258", "X106", "X182", "X7", "X3"),
)
def horvitz_thompson_regions(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..catalog import load_table
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (o.join(c, c.c_custkey == o.o_custkey)
            .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
            .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
            .selectExpr(
                "r_name AS region",
                "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents",
                "CAST(conv(substring(md5(concat('ht:', "
                "CAST(o_orderkey AS STRING))), 1, 15), 16, 10)"
                " AS BIGINT) % 1000000 AS coin")
            .selectExpr(
                "region", "cents", "coin",
                f"LEAST(1000000L, cents DIV {HT_PI_DIVISOR})"
                " AS pi_micro"))
    return (base.groupBy("region")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("cents").cast("long").alias("true_cents"),
                 F.sum(F.when(F.col("coin") < F.col("pi_micro"), 1)
                       .otherwise(0)).cast("long").alias("n_sampled"),
                 F.sum(F.when(F.col("coin") < F.col("pi_micro"),
                              F.expr("(cents * 1000000) DIV pi_micro"))
                       .otherwise(0)).cast("long")
                 .alias("ht_est_cents"))
            .withColumn("abs_err_permille",
                        F.expr("CAST((ABS(ht_est_cents - true_cents)"
                               " * 1000) DIV true_cents AS BIGINT)")))


# --------------------------------------------------------------------------
# X276: iterative proportional fitting (raking) — the survey-weighting
# workhorse the sampling family is missing: X258 (Horvitz-Thompson)
# corrects KNOWN inclusion probabilities, X182 (Neyman) plans strata
# sizes; raking calibrates an OBSERVED cell table to match target
# margins on both axes when only margins are known (Deming-Stephan
# 1940) — how a 100 TB platform reweights last year's (priority x
# returnflag) mix onto this year's marginal totals. Each half-round
# scales cells by target/current margin: weights live on the micro
# grid as BIGINT, margins fold exactly, and each cell update is ONE
# textually-identical DOUBLE expression snapped back to micro —
# IPF_ROUNDS full (row+column) rounds, trajectory output per round.
# Cells are dimension-bounded (5x3) at any data scale; the two fact
# passes (seed year + target year) are the only data-sized work.
# --------------------------------------------------------------------------
IPF_ROUNDS = 4
IPF_SEED_YEAR = 1996
IPF_TARGET_YEAR = 1997


def _ipf_step(axis: str) -> str:
    """One raking half-step: scale every cell so `axis` margins match
    the target. axis joins are on priority (row) or flag (col)."""
    return (f"CAST(ROUND(CAST(w AS DOUBLE) * {axis}_target"
            f" / {axis}_sum, 0) AS BIGINT)")


def _ipf_oracle_sql() -> str:
    parts = [f"""cells AS (
        SELECT o.o_orderpriority AS priority, l.l_returnflag AS flag,
               CAST(COUNT(*) AS BIGINT) AS seed_n
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXTRACT(year FROM l.l_shipdate) = {IPF_SEED_YEAR}
        GROUP BY 1, 2
    ),
    tgt AS (
        SELECT o.o_orderpriority AS priority, l.l_returnflag AS flag,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXTRACT(year FROM l.l_shipdate) = {IPF_TARGET_YEAR}
        GROUP BY 1, 2
    ),
    row_t AS (SELECT priority, CAST(SUM(n) * 1000000 AS BIGINT)
                  AS row_target FROM tgt GROUP BY priority),
    col_t AS (SELECT flag, CAST(SUM(n) * 1000000 AS BIGINT)
                  AS col_target FROM tgt GROUP BY flag),
    w0 AS (
        SELECT priority, flag, seed_n,
               CAST(seed_n * 1000000 AS BIGINT) AS w
        FROM cells
    )"""]
    for r in range(1, IPF_ROUNDS + 1):
        parts.append(f"""wr{r} AS (
        SELECT c.priority, c.flag, c.seed_n,
               {_ipf_step('row')} AS w
        FROM (SELECT w.*, rt.row_target,
                     SUM(w.w) OVER (PARTITION BY w.priority) AS row_sum
              FROM w{r - 1} w JOIN row_t rt
                   ON rt.priority = w.priority) c
    ),
    w{r} AS (
        SELECT c.priority, c.flag, c.seed_n,
               {_ipf_step('col')} AS w
        FROM (SELECT w.*, ct.col_target,
                     SUM(w.w) OVER (PARTITION BY w.flag) AS col_sum
              FROM wr{r} w JOIN col_t ct ON ct.flag = w.flag) c
    )""")
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round, priority, flag,
           seed_n, CAST(w AS BIGINT) AS w_micro
    FROM w{r}""" for r in range(1, IPF_ROUNDS + 1))
    return "WITH " + ",\n    ".join(parts) + "\n" + rows


@register(
    "ipf_raking_weights",
    _ipf_oracle_sql(),
    doc=f"X276 iterative proportional fitting: rake the "
        f"{IPF_SEED_YEAR} (priority x returnflag) cell counts onto "
        f"the {IPF_TARGET_YEAR} row/column marginal totals "
        f"({IPF_ROUNDS} full rounds, Deming-Stephan 1940). Weights "
        "are micro-grid BIGINTs; margins fold exactly; each half-step "
        "scales cells by ONE textually-identical DOUBLE ratio snapped "
        "back to micro. Per-round trajectory over the dimension-"
        "bounded 5x3 cell table; two fact passes total. Python "
        "replay + margin-convergence laws.",
    tags=("X276", "X258", "X182", "X28", "X7"),
)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    fact = (li.join(o, o.o_orderkey == li.l_orderkey)
            .select(F.col("o_orderpriority").alias("priority"),
                    F.col("l_returnflag").alias("flag"),
                    F.year("l_shipdate").alias("yr")))
    cells = (fact.filter(F.col("yr") == IPF_SEED_YEAR)
             .groupBy("priority", "flag")
             .agg(F.count("*").cast("long").alias("seed_n")))
    tgt = (fact.filter(F.col("yr") == IPF_TARGET_YEAR)
           .groupBy("priority", "flag")
           .agg(F.count("*").cast("long").alias("n")))
    row_t = (tgt.groupBy("priority")
             .agg((F.sum("n") * 1000000).cast("long")
                  .alias("row_target")))
    col_t = (tgt.groupBy("flag")
             .agg((F.sum("n") * 1000000).cast("long")
                  .alias("col_target")))
    # 15-cell state frame: one partition, checkpoint per round (plan
    # text + tiny-frame lessons); margins broadcast.
    w = (cells.withColumn("w", (F.col("seed_n") * 1000000)
                          .cast("long"))
         .repartition(1).localCheckpoint())
    row_t = F.broadcast(row_t.localCheckpoint())
    col_t = F.broadcast(col_t.localCheckpoint())
    out = None
    for r in range(1, IPF_ROUNDS + 1):
        wr = (w.join(row_t, "priority")
              .withColumn("row_sum", F.sum("w").over(
                  Window.partitionBy("priority")))
              .selectExpr("priority", "flag", "seed_n",
                          f"{_ipf_step('row')} AS w"))
        w = (wr.join(col_t, "flag")
             .withColumn("col_sum", F.sum("w").over(
                 Window.partitionBy("flag")))
             .selectExpr("priority", "flag", "seed_n",
                         f"{_ipf_step('col')} AS w")
             .localCheckpoint())
        step = w.selectExpr(f"CAST({r} AS BIGINT) AS round", "priority",
                            "flag", "seed_n",
                            "CAST(w AS BIGINT) AS w_micro")
        out = step if out is None else out.unionByName(step)
    return out
