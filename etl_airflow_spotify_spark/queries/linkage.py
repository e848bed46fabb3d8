"""Record-linkage queries (X33): blocked fuzzy matching.

The reference has no linkage surface; this extends §2.B with the
dirty-key consolidation step every real ingest hits (vendor names,
product titles, user agents) — see ``operators/linkage.py`` for the
distinct-first + multi-pass-blocking scale design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.linkage import blocked_fuzzy_pairs
from ..registry import register

MAX_EDIT = 4


@register(
    "fuzzy_name_pairs",
    f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm, n FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm, n FROM names
    ),
    cand AS (
        SELECT DISTINCT a.nm AS value_a, b.nm AS value_b,
                        a.n AS n_a, b.n AS n_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.nm < b.nm
    )
    SELECT value_a, value_b,
           CAST(levenshtein(value_a, value_b) AS BIGINT) AS edit_dist,
           n_a * n_b AS pair_weight
    FROM cand
    WHERE levenshtein(value_a, value_b) <= {MAX_EDIT}
    """,
    doc="X33 blocked fuzzy self-linkage of part names: distinct-first "
        "(rows -> unique values + multiplicity), two blocking passes "
        "(token 1, token 2) unioned and deduped, exact Levenshtein "
        "verify on candidates only. pair_weight = n_a*n_b reconstructs "
        "row-level match counts without a row-level join.",
    tags=("X33", "X3", "X14"),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    return blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT)


_FUZZY_EDGES_SQL = f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM names
    ),
    edges AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    )
"""


@register(
    "fuzzy_cluster_triangles",
    _FUZZY_EDGES_SQL + """
    , tri AS (
        SELECT e1.va AS a, e1.vb AS b, e2.vb AS c
        FROM edges e1
        JOIN edges e2 ON e2.va = e1.vb
        JOIN edges e3 ON e3.va = e1.va AND e3.vb = e2.vb
    ),
    corners AS (
        SELECT a AS v FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri
    )
    SELECT v AS value, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY v
    """,
    doc="X39 triangle counting over the fuzzy-similarity graph: how "
        "densely interlinked each near-duplicate value cluster is "
        "(mutual-similarity triangles are the strongest merge "
        "evidence in entity resolution). The value_a < value_b edge "
        "orientation makes each triangle countable exactly once via "
        "two hash joins — the standard oriented-wedge formulation; at "
        "web scale the orientation key becomes (degree, id), bounding "
        "wedge fan-out by max out-degree ~ sqrt(edges).",
    tags=("X39", "X3", "X7"),
)
def fuzzy_cluster_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    edges = blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(F.col("value_a").alias("va"),
                                  F.col("value_b").alias("vb"))
    e1 = edges.select(F.col("va").alias("a"), F.col("vb").alias("b"))
    e2 = edges.select(F.col("va").alias("b"), F.col("vb").alias("c"))
    e3 = edges.select(F.col("va").alias("a"), F.col("vb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (tri.select(F.col("a").alias("v"))
               .unionAll(tri.select(F.col("b")))
               .unionAll(tri.select(F.col("c"))))
    return (corners.groupBy(F.col("v").alias("value"))
            .agg(F.count("*").cast("long").alias("n_triangles")))


# --------------------------------------------------------------------------
# X107: survivorship ("golden record" construction) — the step AFTER
# entity resolution: each fuzzy-name cluster merges into one master
# record by per-FIELD rules (most-frequent value for name/brand with
# min-value ties, max for price), the MDM complement to dedup's
# keep-one-row policy. Clusters come from min-label connected
# components over the blocked fuzzy edges; every argmax is the
# engine-portable two-aggregate form; all per-cluster frames are
# cluster-cardinality.
# --------------------------------------------------------------------------
@register(
    "survivorship_golden_record",
    f"""
    WITH RECURSIVE names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM names
    ),
    fpairs AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    ),
    edges AS (
        SELECT va, vb FROM fpairs UNION ALL SELECT vb, va FROM fpairs
    ),
    reach(id, lab) AS (
        SELECT DISTINCT va, va FROM edges
        UNION
        SELECT e.vb, r.lab FROM reach r JOIN edges e ON e.va = r.id
    ),
    cc AS (SELECT id AS nm, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    rws AS (
        SELECT cc.cluster_id, p.p_name, p.p_brand, p.p_retailprice
        FROM part p JOIN cc ON cc.nm = p.p_name
    ),
    nmc AS (SELECT cluster_id, p_name, CAST(COUNT(*) AS BIGINT) AS c
            FROM rws GROUP BY cluster_id, p_name),
    nmx AS (SELECT cluster_id, MAX(c) AS mc FROM nmc GROUP BY cluster_id),
    canon AS (
        SELECT nmc.cluster_id, MIN(nmc.p_name) AS canonical_name
        FROM nmc JOIN nmx ON nmx.cluster_id = nmc.cluster_id
                         AND nmc.c = nmx.mc
        GROUP BY nmc.cluster_id
    ),
    brc AS (SELECT cluster_id, p_brand, CAST(COUNT(*) AS BIGINT) AS c
            FROM rws GROUP BY cluster_id, p_brand),
    brx AS (SELECT cluster_id, MAX(c) AS mc FROM brc GROUP BY cluster_id),
    gbrand AS (
        SELECT brc.cluster_id, MIN(brc.p_brand) AS golden_brand
        FROM brc JOIN brx ON brx.cluster_id = brc.cluster_id
                         AND brc.c = brx.mc
        GROUP BY brc.cluster_id
    ),
    stats AS (
        SELECT cluster_id,
               CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(MAX(p_retailprice), 2) AS max_price
        FROM rws GROUP BY cluster_id
    )
    SELECT s.cluster_id, c.canonical_name, g.golden_brand,
           s.n_names, s.n_rows, s.max_price
    FROM stats s JOIN canon c ON c.cluster_id = s.cluster_id
                 JOIN gbrand g ON g.cluster_id = s.cluster_id
    """,
    doc="X107 survivorship: fuzzy-name clusters (blocked edit-distance "
        "edges -> min-label connected components) merge into golden "
        "records by per-field rules — most-frequent name and brand "
        "(min-value ties, two-aggregate argmax), max price, member "
        "counts. The master-data-management step after entity "
        "resolution; oracle replays blocking, closure (recursive CTE) "
        "and every field rule.",
    tags=("X107", "X33", "X30", "X7"),
)
def survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    edges = blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(F.col("value_a").alias("id_a"),
                                  F.col("value_b").alias("id_b"))
    cc = connected_components(edges).select(
        F.col("id").alias("nm"), "cluster_id")
    rws = (part.join(cc, part["p_name"] == cc["nm"])
           .select("cluster_id", "p_name", "p_brand", "p_retailprice"))

    def mode_of(col: str, out: str) -> DataFrame:
        cnt = (rws.groupBy("cluster_id", col)
               .agg(F.count("*").cast("long").alias("c")))
        mx = (cnt.groupBy("cluster_id").agg(F.max("c").alias("mc"))
              .withColumnRenamed("cluster_id", "cid"))
        return (cnt.join(mx, (cnt["cluster_id"] == mx["cid"])
                         & (cnt["c"] == mx["mc"]))
                .groupBy("cluster_id")
                .agg(F.min(col).alias(out)))

    canon = mode_of("p_name", "canonical_name")
    gbrand = mode_of("p_brand", "golden_brand")
    stats = (rws.groupBy("cluster_id")
             .agg(F.countDistinct("p_name").cast("long").alias("n_names"),
                  F.count("*").cast("long").alias("n_rows"),
                  F.round(F.max("p_retailprice"), 2).alias("max_price")))
    return (stats.join(canon, "cluster_id").join(gbrand, "cluster_id")
            .select("cluster_id", "canonical_name", "golden_brand",
                    "n_names", "n_rows", "max_price"))


# --------------------------------------------------------------------------
# X118: entity-resolution evaluation with planted ground truth — the
# measurement harness every linkage deployment needs: plant a
# deterministic one-character typo in 10% of part names (md5-chosen,
# mutation position = len-2, so both blocking tokens survive), run
# the SAME blocked fuzzy pipeline over originals + typos, and score
# recovered vs planted pairs. Plants and truth are pure functions of
# the name, so the oracle replays generation, blocking, verify and
# the metrics; natural near-dup pairs are reported separately (they
# are not errors — they are the pipeline's normal output).
# --------------------------------------------------------------------------
LKEV_PLANT_PCT = 10


@register(
    "linkage_eval_planted",
    f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    plants AS (
        SELECT nm,
               substr(nm, 1, length(nm) - 2)
               || chr(unicode(substr(nm, length(nm) - 1, 1)) + 1)
               || substr(nm, length(nm), 1) AS typo
        FROM names
        WHERE (('0x' || substr(md5('lk:' || nm), 1, 15))::BIGINT % 100)
              < {LKEV_PLANT_PCT}
    ),
    allnames AS (
        SELECT nm, n FROM names
        UNION ALL
        SELECT typo, CAST(1 AS BIGINT) FROM plants
    ),
    vals AS (SELECT nm, CAST(SUM(n) AS BIGINT) AS n FROM allnames
             GROUP BY nm),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM vals
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM vals
    ),
    pred AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    ),
    truth AS (
        SELECT LEAST(nm, typo) AS va, GREATEST(nm, typo) AS vb
        FROM plants
    ),
    hit AS (
        SELECT t.va FROM truth t
        JOIN pred p ON p.va = t.va AND p.vb = t.vb
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_planted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_recovered,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_predicted,
           ROUND((SELECT COUNT(*) FROM hit)::DOUBLE /
                 GREATEST((SELECT COUNT(*) FROM truth), 1), 6)
               AS planted_recall
    """,
    doc=f"X118 linkage evaluation: {LKEV_PLANT_PCT}% of part names "
        "gain a deterministic one-char typo (md5-chosen, position "
        "len-2 so blocking tokens survive); the SAME blocked "
        "edit-distance pipeline runs over originals + plants and is "
        "scored on planted-pair recall (expected 1.0 — substitution "
        "distance 1, shared blocks) alongside total predictions. The "
        "ground-truth harness that turns entity resolution from "
        "vibes into a regression-gated metric.",
    tags=("X118", "X33", "X2"),
)
def linkage_eval_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("lk:"),
                                                F.col("nm"))), 1, 15),
                     16, 10).cast("long") % 100)
    typo = F.expr(
        "concat(substr(nm, 1, length(nm) - 2), "
        "char(ascii(substr(nm, length(nm) - 1, 1)) + 1), "
        "substr(nm, length(nm), 1))")
    plants = (names.filter(bucket < LKEV_PLANT_PCT)
              .select("nm", typo.alias("typo")))
    allnames = (names.select("nm", "n")
                .unionByName(plants.select(F.col("typo").alias("nm"),
                                           F.lit(1).cast("long")
                                           .alias("n"))))
    vals = allnames.groupBy("nm").agg(F.sum("n").cast("long").alias("n"))
    pred = blocked_fuzzy_pairs(
        vals, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(F.col("value_a").alias("va"),
                                  F.col("value_b").alias("vb"))
    from ..caching import persist_tracked
    pred = persist_tracked(pred)
    truth = plants.select(F.least("nm", "typo").alias("va"),
                          F.greatest("nm", "typo").alias("vb"))
    hit = truth.join(pred, ["va", "vb"], "left_semi")
    return (truth.agg(F.count("*").cast("long").alias("n_planted"))
            .crossJoin(hit.agg(F.count("*").cast("long")
                               .alias("n_recovered")))
            .crossJoin(pred.agg(F.count("*").cast("long")
                                .alias("n_predicted")))
            .select("n_planted", "n_recovered", "n_predicted",
                    F.round(F.col("n_recovered").cast("double")
                            / F.greatest(F.col("n_planted"), F.lit(1)), 6)
                    .alias("planted_recall")))


# --------------------------------------------------------------------------
# X120: Fellegi-Sunter probabilistic linkage scoring — the classical
# model behind every production record-linkage system: each candidate
# pair scores sum_f log2(m_f/u_f) over AGREEING comparison fields plus
# log2((1-m_f)/(1-u_f)) over disagreeing ones, where m = P(agree |
# match) and u = P(agree | non-match). The planted typos (X118) supply
# labeled matches, so m/u estimate from data (add-one smoothed); all
# probabilities are integer-count ratios, so every log term is a
# difference of micro-grid log2s of INTEGERS and pair scores fold as
# exact BIGINT. Output: the score-band separation histogram (the FS
# decision plot) with truth counts per band.
# --------------------------------------------------------------------------
FS_FIELDS = (
    ("tok1", "split_part({v}, ' ', 1)"),
    ("tok2", "split_part({v}, ' ', 2)"),
    ("length", "CAST(length({v}) AS VARCHAR)"),
    ("tail4", "substr({v}, GREATEST(length({v}) - 3, 1))"),
)
# Spark twins of the field expressions (same semantics; substr with a
# start beyond 1 clamps identically, split_part/length agree)
_FS_SPARK = {
    "tok1": "split_part({v}, ' ', 1)",
    "tok2": "split_part({v}, ' ', 2)",
    "length": "CAST(length({v}) AS STRING)",
    "tail4": "substr({v}, GREATEST(length({v}) - 3, 1))",
}


def _fs_oracle_sql() -> str:
    agree_cols = ",\n               ".join(
        f"CASE WHEN {expr.format(v='p.va')} = {expr.format(v='p.vb')} "
        f"THEN 1 ELSE 0 END AS ag_{name}"
        for name, expr in FS_FIELDS)
    m_aggs = ", ".join(
        f"CAST(SUM(CASE WHEN is_match = 1 THEN ag_{n} ELSE 0 END) + 1 "
        f"AS BIGINT) AS m_{n}" for n, _ in FS_FIELDS)
    u_aggs = ", ".join(
        f"CAST(SUM(CASE WHEN is_match = 0 THEN ag_{n} ELSE 0 END) + 1 "
        f"AS BIGINT) AS u_{n}" for n, _ in FS_FIELDS)

    def micro(x):
        return f"ROUND(log2({x}) * 1e6, 0)::BIGINT"

    terms = " + ".join(
        f"CASE WHEN l.ag_{n} = 1 THEN "
        f"({micro(f's.m_{n}')} - {micro('s.nm2')} "
        f"- {micro(f's.u_{n}')} + {micro('s.nu2')}) "
        f"ELSE ({micro(f's.nm2 - s.m_{n} + 1')} - {micro('s.nm2')} "
        f"- {micro(f's.nu2 - s.u_{n} + 1')} + {micro('s.nu2')}) END"
        for n, _ in FS_FIELDS)
    return f"""
    WITH names AS (
        SELECT p_name AS nm FROM part GROUP BY p_name
    ),
    plants AS (
        SELECT nm,
               substr(nm, 1, length(nm) - 2)
               || chr(unicode(substr(nm, length(nm) - 1, 1)) + 1)
               || substr(nm, length(nm), 1) AS typo
        FROM names
        WHERE (('0x' || substr(md5('lk:' || nm), 1, 15))::BIGINT % 100)
              < {LKEV_PLANT_PCT}
    ),
    vals AS (
        SELECT nm FROM names
        UNION
        SELECT typo FROM plants
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM vals
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM vals
    ),
    cand AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
    ),
    truth AS (
        SELECT LEAST(nm, typo) AS va, GREATEST(nm, typo) AS vb
        FROM plants
    ),
    lab AS (
        SELECT p.va, p.vb,
               CASE WHEN t.va IS NOT NULL THEN 1 ELSE 0 END AS is_match,
               {agree_cols}
        FROM cand p LEFT JOIN truth t ON t.va = p.va AND t.vb = p.vb
    ),
    stats AS (
        SELECT {m_aggs}, {u_aggs},
               CAST(SUM(is_match) + 2 AS BIGINT) AS nm2,
               CAST(SUM(1 - is_match) + 2 AS BIGINT) AS nu2
        FROM lab
    ),
    scored AS (
        SELECT l.is_match, ({terms}) AS score_micro
        FROM lab l CROSS JOIN stats s
    )
    SELECT CAST(FLOOR(score_micro / 1000000.0) AS BIGINT) AS score_band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_match) AS BIGINT) AS n_matches
    FROM scored GROUP BY 1
    """


@register(
    "fellegi_sunter_bands",
    _fs_oracle_sql(),
    doc="X120 Fellegi-Sunter probabilistic linkage: blocking candidates "
        "score sum log2(m/u) over four agreement fields (token1, "
        "token2, length, last-4-chars), with m/u estimated from the "
        "planted-typo labels (add-one smoothed integer ratios -> every "
        "log term is micro-grid-exact, pair scores fold as BIGINT). "
        "Output is the score-band histogram with match counts — the "
        "separation plot that sets FS accept/review/reject thresholds. "
        "Candidates come from the same bounded blocking as X33; stats "
        "are one scalar row broadcast onto a map-only scoring pass.",
    tags=("X120", "X33", "X118", "X7"),
)
def fellegi_sunter_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("nm")).distinct()
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("lk:"),
                                                F.col("nm"))), 1, 15),
                     16, 10).cast("long") % 100)
    typo = F.expr(
        "concat(substr(nm, 1, length(nm) - 2), "
        "char(ascii(substr(nm, length(nm) - 1, 1)) + 1), "
        "substr(nm, length(nm), 1))")
    plants = (names.filter(bucket < LKEV_PLANT_PCT)
              .select("nm", typo.alias("typo")))
    vals = (names.select("nm")
            .unionByName(plants.select(F.col("typo").alias("nm")))
            .distinct())
    blocked = (vals.select(F.expr("split_part(nm, ' ', 1)").alias("blk"),
                           "nm")
               .unionByName(
                   vals.select(F.expr("split_part(nm, ' ', 2)")
                               .alias("blk"), "nm")))
    a = blocked.select("blk", F.col("nm").alias("va"))
    b = blocked.select("blk", F.col("nm").alias("vb"))
    cand = (a.join(b, "blk").filter(F.col("va") < F.col("vb"))
            .select("va", "vb").distinct())
    truth = plants.select(F.least("nm", "typo").alias("va"),
                          F.greatest("nm", "typo").alias("vb"),
                          F.lit(1).alias("t"))
    agree_cols = [
        (F.expr(_FS_SPARK[n].format(v="va"))
         == F.expr(_FS_SPARK[n].format(v="vb"))).cast("int")
        .alias(f"ag_{n}")
        for n, _ in FS_FIELDS]
    lab = persist_tracked(
        cand.join(truth, ["va", "vb"], "left")
        .select("va", "vb",
                F.coalesce(F.col("t"), F.lit(0)).alias("is_match"),
                *agree_cols))
    aggs = []
    for n, _ in FS_FIELDS:
        aggs.append((F.sum(F.when(F.col("is_match") == 1,
                                  F.col(f"ag_{n}")).otherwise(0))
                     .cast("long") + 1).alias(f"m_{n}"))
        aggs.append((F.sum(F.when(F.col("is_match") == 0,
                                  F.col(f"ag_{n}")).otherwise(0))
                     .cast("long") + 1).alias(f"u_{n}"))
    aggs.append((F.sum("is_match").cast("long") + 2).alias("nm2"))
    aggs.append((F.sum(F.lit(1) - F.col("is_match")).cast("long") + 2)
                .alias("nu2"))
    stats = lab.agg(*aggs)

    def micro(c):
        return F.round(F.log2(c) * 1e6, 0).cast("long")

    score = None
    for n, _ in FS_FIELDS:
        agree_term = (micro(F.col(f"m_{n}")) - micro(F.col("nm2"))
                      - micro(F.col(f"u_{n}")) + micro(F.col("nu2")))
        dis_term = (micro(F.col("nm2") - F.col(f"m_{n}") + 1)
                    - micro(F.col("nm2"))
                    - micro(F.col("nu2") - F.col(f"u_{n}") + 1)
                    + micro(F.col("nu2")))
        term = F.when(F.col(f"ag_{n}") == 1, agree_term) \
            .otherwise(dis_term)
        score = term if score is None else score + term
    scored = (lab.crossJoin(F.broadcast(stats))
              .select("is_match", score.alias("score_micro")))
    return (scored
            .groupBy(F.floor(F.col("score_micro") / 1000000.0)
                     .cast("long").alias("score_band"))
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum("is_match").cast("long").alias("n_matches")))


# --------------------------------------------------------------------------
# X134: sorted-neighborhood blocking (SNM) — the OTHER classical ER
# candidate generator (Hernandez-Stolfo), complementing the token
# blocking of X33/X118: sort the key space, pair each record with its
# next SNM_W - 1 neighbors in sort order. Distributed form: bucket by
# a sort-key prefix (windows never cross buckets — the documented
# recall trade of blocked SNM), rank *within* buckets (a partitioned
# window, never a global one), and generate neighbors by exploding
# rank offsets into a pure (bucket, rank) equi-join — fan-out is
# EXACTLY (SNM_W - 1) per record by construction (law-tested), the
# property that makes SNM's candidate volume linear where token
# blocking's depends on block-size skew. Evaluated on the same
# planted-typo corpus as X118 (mutation at len-2 preserves the
# prefix, so plants land in their original's bucket).
# --------------------------------------------------------------------------
SNM_W = 5        # neighborhood width (pairs per record: SNM_W - 1)
SNM_PREFIX = 4   # bucket = first chars of the sort key


@register(
    "snm_blocking_eval",
    f"""
    WITH names AS (
        SELECT p_name AS nm FROM part GROUP BY p_name
    ),
    plants AS (
        SELECT nm,
               substr(nm, 1, length(nm) - 2)
               || chr(unicode(substr(nm, length(nm) - 1, 1)) + 1)
               || substr(nm, length(nm), 1) AS typo
        FROM names
        WHERE (('0x' || substr(md5('lk:' || nm), 1, 15))::BIGINT % 100)
              < {LKEV_PLANT_PCT}
    ),
    vals AS (
        SELECT nm FROM names
        UNION
        SELECT typo FROM plants
    ),
    ranked AS (
        SELECT substr(nm, 1, {SNM_PREFIX}) AS blk, nm,
               ROW_NUMBER() OVER (PARTITION BY substr(nm, 1, {SNM_PREFIX})
                                  ORDER BY nm) AS rn
        FROM vals
    ),
    cand AS (
        SELECT a.nm AS va, b.nm AS vb
        FROM (SELECT blk, nm, rn + j.j AS rn2
              FROM ranked,
                   (SELECT unnest(generate_series(1, {SNM_W - 1})) AS j) j)
             a
        JOIN ranked b ON b.blk = a.blk AND b.rn = a.rn2
    ),
    pred AS (
        SELECT va, vb FROM cand WHERE levenshtein(va, vb) <= {MAX_EDIT}
    ),
    truth AS (
        SELECT LEAST(nm, typo) AS va, GREATEST(nm, typo) AS vb
        FROM plants
    ),
    hit AS (
        SELECT t.va FROM truth t
        JOIN pred p ON p.va = t.va AND p.vb = t.vb
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM vals) AS n_records,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_predicted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_planted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_recovered,
           ROUND((SELECT COUNT(*) FROM hit)::DOUBLE /
                 GREATEST((SELECT COUNT(*) FROM truth), 1), 6)
               AS planted_recall
    """,
    doc=f"X134 sorted-neighborhood ER blocking: prefix-bucketed sort "
        f"({SNM_PREFIX}-char buckets), per-bucket rank windows of "
        f"width {SNM_W}, neighbor pairs via rank-offset explode into a "
        "(bucket, rank) equi-join — candidate volume is exactly "
        f"(w-1) x records minus bucket tails, immune to block-size "
        "skew. Verified with levenshtein <= {MAX_EDIT} and scored on "
        "the X118 planted-typo corpus (same plants, same truth).",
    tags=("X134", "X33", "X118", "X11", "X3"),
)
def snm_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("nm")).distinct()
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("lk:"),
                                                F.col("nm"))), 1, 15),
                     16, 10).cast("long") % 100)
    typo = F.expr(
        "concat(substr(nm, 1, length(nm) - 2), "
        "char(ascii(substr(nm, length(nm) - 1, 1)) + 1), "
        "substr(nm, length(nm), 1))")
    plants = (names.filter(bucket < LKEV_PLANT_PCT)
              .select("nm", typo.alias("typo")))
    vals = (names.select("nm")
            .union(plants.select(F.col("typo").alias("nm"))).distinct())
    w = Window.partitionBy("blk").orderBy("nm")
    ranked = (vals.withColumn("blk", F.substring("nm", 1, SNM_PREFIX))
              .withColumn("rn", F.row_number().over(w)))
    offs = (ranked.withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.lit(SNM_W - 1))))
        .select("blk", F.col("nm").alias("va"),
                (F.col("rn") + F.col("j")).alias("rn")))
    cand = offs.join(ranked.select("blk", F.col("nm").alias("vb"), "rn"),
                     ["blk", "rn"])
    pred = cand.filter(F.levenshtein("va", "vb") <= MAX_EDIT) \
        .select("va", "vb")
    truth = plants.select(F.least("nm", "typo").alias("va"),
                          F.greatest("nm", "typo").alias("vb"))
    hit = truth.join(pred, ["va", "vb"], "left_semi")
    n_records = vals.count()
    n_candidates = cand.count()
    n_predicted = pred.count()
    n_planted = truth.count()
    n_recovered = hit.count()
    return spark.createDataFrame(
        [(n_records, n_candidates, n_predicted, n_planted, n_recovered,
          round(n_recovered / max(n_planted, 1), 6))],
        "n_records BIGINT, n_candidates BIGINT, n_predicted BIGINT, "
        "n_planted BIGINT, n_recovered BIGINT, planted_recall DOUBLE")


# --------------------------------------------------------------------------
# X173: B-cubed cluster evaluation — the standard ER/coreference
# metric (Bagga & Baldwin) that X118's pair recall cannot express:
# pair metrics ignore HOW predictions partition the records, B-cubed
# scores every ITEM's cluster against its truth entity
# (P_i = |C(i) n T(i)|/|C(i)|, R_i likewise over T(i)) and averages.
# The harness reuses X118's planted-typo universe (truth entity =
# {original, its typo}); predictions are connected components over
# the SAME blocked fuzzy pairs (min-label closure — components are
# near-identical-name cliques). Every per-item fraction is snapped to
# micro units (a single IEEE division of cell integers) and folded as
# BIGINT cell-count x micro products, so the averages are
# summation-order-proof; F1 is one final expression. Cells =
# (pred_cluster x truth_entity) intersection counts — one aggregate.
# --------------------------------------------------------------------------
@register(
    "bcubed_linkage_eval",
    f"""
    WITH RECURSIVE names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    plants AS (
        SELECT nm,
               substr(nm, 1, length(nm) - 2)
               || chr(unicode(substr(nm, length(nm) - 1, 1)) + 1)
               || substr(nm, length(nm), 1) AS typo
        FROM names
        WHERE (('0x' || substr(md5('lk:' || nm), 1, 15))::BIGINT % 100)
              < {LKEV_PLANT_PCT}
    ),
    items AS (
        SELECT nm, nm AS te FROM names
        UNION ALL
        SELECT typo, nm FROM plants
    ),
    vals AS (SELECT DISTINCT nm FROM items),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM vals
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM vals
    ),
    pred AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    ),
    edges AS (
        SELECT va AS src, vb AS dst FROM pred
        UNION SELECT vb, va FROM pred
    ),
    reach(v, r) AS (
        SELECT nm, nm FROM vals
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    lab AS (SELECT v AS nm, MIN(r) AS pc FROM reach GROUP BY v),
    joined AS (
        SELECT i.nm, i.te, l.pc FROM items i JOIN lab l ON l.nm = i.nm
    ),
    cells AS (
        SELECT pc, te, CAST(COUNT(*) AS BIGINT) AS o
        FROM joined GROUP BY pc, te
    ),
    csize AS (SELECT pc, CAST(SUM(o) AS BIGINT) AS c FROM cells
              GROUP BY pc),
    tsize AS (SELECT te, CAST(SUM(o) AS BIGINT) AS t FROM cells
              GROUP BY te),
    folds AS (
        SELECT CAST(SUM(cells.o) AS BIGINT) AS n_items,
               CAST(SUM(cells.o * CAST(ROUND(1000000.0 * cells.o
                                             / csize.c, 0) AS BIGINT))
                    AS BIGINT) AS p_fold,
               CAST(SUM(cells.o * CAST(ROUND(1000000.0 * cells.o
                                             / tsize.t, 0) AS BIGINT))
                    AS BIGINT) AS r_fold
        FROM cells JOIN csize ON csize.pc = cells.pc
        JOIN tsize ON tsize.te = cells.te
    )
    SELECT n_items,
           (SELECT CAST(COUNT(DISTINCT pc) AS BIGINT) FROM lab)
               AS n_pred_clusters,
           (SELECT CAST(COUNT(DISTINCT te) AS BIGINT) FROM items)
               AS n_truth_entities,
           ROUND(CAST(p_fold AS DOUBLE) / n_items / 1000000.0, 6)
               AS bcubed_p,
           ROUND(CAST(r_fold AS DOUBLE) / n_items / 1000000.0, 6)
               AS bcubed_r,
           ROUND(2.0 * (CAST(p_fold AS DOUBLE) / n_items)
                     * (CAST(r_fold AS DOUBLE) / n_items)
                 / ((CAST(p_fold AS DOUBLE) / n_items)
                    + (CAST(r_fold AS DOUBLE) / n_items))
                 / 1000000.0, 6) AS bcubed_f1
    FROM folds
    """,
    doc="X173 B-cubed P/R/F1 of the blocked-fuzzy ER clusters against "
        "the X118 planted-typo truth: min-label closure components as "
        "predictions, (cluster x entity) intersection cells in one "
        "aggregate, per-item fractions micro-snapped and folded as "
        "BIGINT products — order-proof averages, one final F1 "
        "expression.",
    tags=("X173", "X118", "X33", "X30", "X7"),
)
def bcubed_linkage_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked
    from ..operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("lk:"),
                                                F.col("nm"))), 1, 15),
                     16, 10).cast("long") % 100)
    typo = F.expr(
        "concat(substr(nm, 1, length(nm) - 2), "
        "char(ascii(substr(nm, length(nm) - 1, 1)) + 1), "
        "substr(nm, length(nm), 1))")
    plants = (names.filter(bucket < LKEV_PLANT_PCT)
              .select("nm", typo.alias("typo")))
    items = persist_tracked(
        names.select("nm", F.col("nm").alias("te"))
        .unionByName(plants.select(F.col("typo").alias("nm"),
                                   F.col("nm").alias("te"))))
    vals = items.select("nm").distinct() \
        .withColumn("n", F.lit(1).cast("long"))
    pred = blocked_fuzzy_pairs(
        vals, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(F.col("value_a").alias("id_a"),
                                  F.col("value_b").alias("id_b"))
    # CC only over names that actually pair up (near-dup components
    # are tiny cliques); every unmatched name is its own cluster via
    # an anti-join — the CC loop never touches the singleton majority
    cc = connected_components(pred).select(
        F.col("id").alias("nm"), F.col("cluster_id").alias("pc"))
    singles = (vals.select("nm")
               .join(cc.select("nm"), "nm", "left_anti")
               .select("nm", F.col("nm").alias("pc")))
    lab = persist_tracked(cc.unionByName(singles))
    joined = items.join(lab, "nm")
    cells = joined.groupBy("pc", "te") \
        .agg(F.count("*").cast("long").alias("o"))
    csize = cells.groupBy("pc").agg(F.sum("o").cast("long").alias("c"))
    tsize = cells.groupBy("te").agg(F.sum("o").cast("long").alias("t"))
    folds = (cells.join(csize, "pc").join(tsize, "te")
             .agg(F.sum("o").cast("long").alias("n_items"),
                  F.sum(F.col("o")
                        * F.round(1000000.0 * F.col("o") / F.col("c"), 0)
                        .cast("long")).cast("long").alias("p_fold"),
                  F.sum(F.col("o")
                        * F.round(1000000.0 * F.col("o") / F.col("t"), 0)
                        .cast("long")).cast("long").alias("r_fold")))
    n_pc = lab.select("pc").distinct().count()
    n_te = items.select("te").distinct().count()
    p = F.col("p_fold").cast("double") / F.col("n_items")
    r = F.col("r_fold").cast("double") / F.col("n_items")
    return folds.select(
        "n_items",
        F.lit(n_pc).cast("long").alias("n_pred_clusters"),
        F.lit(n_te).cast("long").alias("n_truth_entities"),
        F.round(p / 1000000.0, 6).alias("bcubed_p"),
        F.round(r / 1000000.0, 6).alias("bcubed_r"),
        F.round(2.0 * p * r / (p + r) / 1000000.0, 6).alias("bcubed_f1"))


# --------------------------------------------------------------------------
# X184: phonetic (soundex) blocking — the classical ER blocking key
# for NAME-shaped dirt (typos that token-equality blocking (X33)
# misses still collide phonetically: 'gear'/'geer', 'bolt'/'boldt').
# The soundex function itself is GENERATED SQL shared VERBATIM by
# both engines (the X145 discipline): translate() maps letters to
# the classic digit codes, consecutive-duplicate collapse is a chain
# of bounded replace() passes (RE2 has no pattern backreferences, so
# the usual regex dedup is not portable), zero-drop + rpad complete
# the 4-char code — a pure string function, bit-identical anywhere.
# Candidates block on (token position, soundex) for both name
# tokens; Levenshtein verifies; each surviving pair also reports
# whether plain token-equality blocking would have found it, making
# the phonetic lift directly measurable.
# --------------------------------------------------------------------------
_SOUNDEX_MAP = "01230120022455012623010202"


def soundex_sql(t: str) -> str:
    """Classic-soundex SQL over expression ``t`` (lowercase alpha),
    valid verbatim in Spark SQL and DuckDB: translate -> bounded
    replace-chain dedup -> drop first code + zeros -> rpad to 3."""
    code = f"translate({t}, 'abcdefghijklmnopqrstuvwxyz', '{_SOUNDEX_MAP}')"
    for d in "0123456":
        for _ in range(3):  # collapses runs up to length 8
            code = f"replace({code}, '{d}{d}', '{d}')"
    return (f"upper(substr({t}, 1, 1)) || "
            f"rpad(substr(replace(substr({code}, 2), '0', ''), 1, 3),"
            f" 3, '0')")


def _soundex_pairs_sql() -> str:
    s1 = soundex_sql("split_part(nm, ' ', 1)")
    s2 = soundex_sql("split_part(nm, ' ', 2)")
    return f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT 1 AS pos, {s1} AS blk, nm, n FROM names
        UNION ALL
        SELECT 2 AS pos, {s2} AS blk, nm, n FROM names
    ),
    cand AS (
        SELECT DISTINCT a.nm AS value_a, b.nm AS value_b,
                        a.n AS n_a, b.n AS n_b
        FROM blocked a JOIN blocked b
          ON a.pos = b.pos AND a.blk = b.blk AND a.nm < b.nm
    )
    SELECT value_a, value_b,
           CAST(levenshtein(value_a, value_b) AS BIGINT) AS edit_dist,
           n_a * n_b AS pair_weight,
           CASE WHEN split_part(value_a, ' ', 1)
                     = split_part(value_b, ' ', 1)
                  OR split_part(value_a, ' ', 2)
                     = split_part(value_b, ' ', 2)
                THEN 1 ELSE 0 END AS token_blocked
    FROM cand
    WHERE levenshtein(value_a, value_b) <= {MAX_EDIT}
    ORDER BY value_a, value_b
    """


@register(
    "soundex_blocking_pairs",
    _soundex_pairs_sql(),
    doc="X184 phonetic ER blocking: per-token classic soundex keys "
        "from generated SQL shared verbatim by both engines "
        "(translate + bounded replace-chain dedup — no RE2 "
        "backreferences), distinct-first candidates, Levenshtein "
        "verify, and a token_blocked flag quantifying the lift over "
        "X33's token-equality blocking.",
    tags=("X184", "X33", "X14", "X3"),
)
def soundex_blocking_pairs(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..catalog import spread

    part = load_table(spark, sf_dir, "part")
    names = spread(
        part.groupBy(F.col("p_name").alias("nm"))
        .agg(F.count("*").cast("long").alias("n")), "nm")
    blocked = (names.select(
        F.lit(1).alias("pos"),
        F.expr(soundex_sql("split_part(nm, ' ', 1)")).alias("blk"),
        "nm", "n")
        .unionByName(names.select(
            F.lit(2).alias("pos"),
            F.expr(soundex_sql("split_part(nm, ' ', 2)")).alias("blk"),
            "nm", "n")))
    a = blocked.select("pos", "blk", F.col("nm").alias("value_a"),
                       F.col("n").alias("n_a"))
    b = blocked.select("pos", "blk", F.col("nm").alias("value_b"),
                       F.col("n").alias("n_b"))
    cand = (a.join(b, ["pos", "blk"])
            .filter(F.col("value_a") < F.col("value_b"))
            .select("value_a", "value_b", "n_a", "n_b")
            .distinct())
    tok = lambda c, i: F.split_part(F.col(c), F.lit(" "), F.lit(i))
    return (cand
            .withColumn("edit_dist",
                        F.levenshtein("value_a", "value_b")
                        .cast("long"))
            .filter(F.col("edit_dist") <= MAX_EDIT)
            .select("value_a", "value_b", "edit_dist",
                    (F.col("n_a") * F.col("n_b")).alias("pair_weight"),
                    F.when((tok("value_a", 1) == tok("value_b", 1))
                           | (tok("value_a", 2) == tok("value_b", 2)),
                           1).otherwise(0).alias("token_blocked"))
            .orderBy("value_a", "value_b"))


# --------------------------------------------------------------------------
# X189: single-link hierarchical clustering profile (dendrogram cut
# sweep) — agglomerative clustering's workhorse, read off its
# defining equivalence: the single-link clusters at distance
# threshold t are EXACTLY the connected components of the
# "distance <= t" graph, so sweeping t over the edit-distance ladder
# 1..MAX_EDIT yields the whole dendrogram profile (cluster counts,
# singleton counts, largest cluster) without ever materializing a
# merge tree. Edges are computed ONCE at the loosest threshold
# (distinct-first blocked candidates + Levenshtein verify, the X33
# plan) and each cut only filters them; components run min-label to
# convergence on Spark and as a recursive-CTE closure in the oracle
# (the X107 twin pattern). Nodes outside every edge are singleton
# clusters by definition — the left-join completion both engines
# replay.
# --------------------------------------------------------------------------
def _dendrogram_oracle() -> str:
    per_t = []
    for t in range(1, MAX_EDIT + 1):
        per_t.append(f"""
    edges{t} AS (
        SELECT va, vb FROM fpairs WHERE d <= {t}
        UNION ALL
        SELECT vb, va FROM fpairs WHERE d <= {t}
    ),
    reach{t}(id, lab) AS (
        SELECT DISTINCT va, va FROM edges{t}
        UNION
        SELECT e.vb, r.lab FROM reach{t} r JOIN edges{t} e
            ON e.va = r.id
    ),
    cc{t} AS (
        SELECT id AS nm, MIN(lab) AS lab FROM reach{t} GROUP BY id
    ),
    asg{t} AS (
        SELECT n.nm, COALESCE(cc{t}.lab, n.nm) AS lab
        FROM names n LEFT JOIN cc{t} ON cc{t}.nm = n.nm
    ),
    sz{t} AS (
        SELECT lab, CAST(COUNT(*) AS BIGINT) AS sz
        FROM asg{t} GROUP BY lab
    ),
    row{t} AS (
        SELECT CAST({t} AS BIGINT) AS threshold,
               CAST(SUM(sz) AS BIGINT) AS n_values,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singletons,
               CAST(MAX(sz) AS BIGINT) AS max_cluster_size
        FROM sz{t}
    )""")
    final = " UNION ALL ".join(f"SELECT * FROM row{t}"
                               for t in range(1, MAX_EDIT + 1))
    return (f"""
    WITH RECURSIVE names AS (
        SELECT p_name AS nm FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM names
    ),
    fpairs AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb,
                        levenshtein(a.nm, b.nm) AS d
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    ),""" + ",".join(per_t)
            + f" SELECT * FROM ({final}) ORDER BY threshold")


@register(
    "single_link_dendrogram",
    _dendrogram_oracle(),
    doc=f"X189 single-link dendrogram profile: clusters at edit "
        f"thresholds 1..{MAX_EDIT} as connected components of the "
        "'distance <= t' graph (edges verified once at the loosest "
        "cut, each sweep step only filters), min-label CC vs "
        "recursive-CTE closure twin, singleton completion via left "
        "join; per-cut cluster/singleton/max-size counts.",
    tags=("X189", "X33", "X30", "X161", "X7"),
)
def single_link_dendrogram(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked
    from ..operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    names = persist_tracked(
        part.groupBy(F.col("p_name").alias("nm"))
        .agg(F.count("*").cast("long").alias("n")))
    pairs = persist_tracked(blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(
            F.col("value_a").alias("va"), F.col("value_b").alias("vb"),
            F.col("edit_dist").alias("d")))
    out = None
    for t in range(1, MAX_EDIT + 1):
        et = (pairs.filter(F.col("d") <= t)
              .select(F.col("va").alias("id_a"),
                      F.col("vb").alias("id_b")))
        cc = connected_components(et).select(
            F.col("id").alias("nm"), F.col("cluster_id").alias("lab"))
        asg = (names.select("nm").join(cc, "nm", "left")
               .select("nm", F.coalesce("lab", F.col("nm"))
                       .alias("lab")))
        sz = asg.groupBy("lab").agg(F.count("*").cast("long")
                                    .alias("sz"))
        row = sz.agg(
            F.lit(t).cast("long").alias("threshold"),
            F.sum("sz").cast("long").alias("n_values"),
            F.count("*").cast("long").alias("n_clusters"),
            F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
            .cast("long").alias("n_singletons"),
            F.max("sz").cast("long").alias("max_cluster_size"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("threshold")
