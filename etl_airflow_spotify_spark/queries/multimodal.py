"""Multimodal + UDF-surface queries (X19, X24) and the map battery
(X14 maps).

``multimodal_metadata`` is oracle-checked by rebuilding the same binary
payloads in DuckDB SQL and extracting the same header fields — the
whole binary pipeline (build -> sniff -> decode) is hash-verified, not
just row-counted.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table, spread
from ..operators import multimodal as M
from ..registry import register


@register(
    "multimodal_metadata",
    r"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'RIFF'::BLOB
                    ELSE '\x89PNG'::BLOB END
               || unhex(lpad(hex(n_chars % 1024 + 1), 8, '0'))
               || unhex(lpad(hex(doc_id % 512 + 1), 8, '0'))
               || encode(text) AS content,
               CASE WHEN doc_id % 7 = 0 THEN 'application/octet-stream'
                    WHEN doc_id % 3 = 0 THEN 'audio/wav'
                    ELSE 'image/png' END AS mime,
               n_chars % 1024 + 1 AS exp_width,
               doc_id % 512 + 1 AS exp_height
        FROM documents
    )
    SELECT media_id, mime,
           CASE WHEN substring(hex(content), 1, 8) = hex('\x89PNG'::BLOB)
                    THEN 'image/png'
                WHEN substring(hex(content), 1, 8) = hex('RIFF'::BLOB)
                    THEN 'audio/wav'
                ELSE 'application/octet-stream' END AS mime_sniffed,
           CAST(octet_length(content) AS BIGINT) AS size_bytes,
           CAST(exp_width AS BIGINT) AS width,
           CAST(exp_height AS BIGINT) AS height
    FROM media
    """,
    doc="Binary media columns: build + magic-sniff + header decode, all "
        "JVM-side; oracle rebuilds the payloads in SQL and derives the "
        "expected header fields independently from the source columns.",
    tags=("X19",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.build_media_from_documents(docs)
    return M.with_media_metadata(media).select(
        "media_id", "mime", "mime_sniffed", "size_bytes", "width", "height")


@register(
    "multimodal_decode",
    """
    SELECT doc_id AS media_id,
           CAST(n_chars % 1024 + 1 AS INTEGER) AS width,
           CAST(doc_id % 512 + 1 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_payload_bytes,
           'fake' AS decoder
    FROM documents
    """,
    doc="Arrow-batched media decode via mapInPandas (stub decoder). The "
        "oracle derives the expected header fields straight from the "
        "source columns, so the build->mapInPandas->decode chain is "
        "hash-verified end to end.",
    tags=("X19", "X24"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return M.decode_media(M.build_media_from_documents(docs))


@register(
    "multimodal_resize",
    """
    WITH m AS (SELECT doc_id AS media_id,
                      CAST(n_chars % 1024 + 1 AS BIGINT) AS w,
                      CAST(doc_id % 512 + 1 AS BIGINT) AS h
               FROM documents)
    SELECT media_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN GREATEST(w, h) <= 128 THEN w
                     ELSE GREATEST(w * 128 // GREATEST(w, h), 1)
                END AS INTEGER) AS thumb_w,
           CAST(CASE WHEN GREATEST(w, h) <= 128 THEN h
                     ELSE GREATEST(h * 128 // GREATEST(w, h), 1)
                END AS INTEGER) AS thumb_h
    FROM m
    """,
    doc="Thumbnail resize plumbing (mapInPandas, integer floor scaling, "
        "aspect preserved); oracle replays the arithmetic exactly.",
    tags=("X19", "X24"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return M.resize_media(M.build_media_from_documents(docs))


@register(
    "multimodal_frames",
    """
    WITH d AS (SELECT doc_id AS media_id,
                      octet_length(encode(text)) AS p
               FROM documents),
    f AS (SELECT media_id, p,
                 UNNEST(generate_series(0, ((p + 255) // 256) - 1, 4)) AS fno
          FROM d)
    SELECT media_id, CAST(fno AS INTEGER) AS frame_no,
           CAST(LEAST(256, p - fno * 256) AS INTEGER) AS frame_len
    FROM f
    """,
    doc="Video-style frame sampling as a 1->N mapInPandas expansion "
        "(every 4th 256-byte frame of the payload); oracle replays the "
        "frame arithmetic with a lateral range().",
    tags=("X19", "X24"),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return M.sample_frames(M.build_media_from_documents(docs))


@register(
    "multimodal_embed",
    r"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'RIFF'::BLOB
                    ELSE '\x89PNG'::BLOB END
               || unhex(lpad(hex(n_chars % 1024 + 1), 8, '0'))
               || unhex(lpad(hex(doc_id % 512 + 1), 8, '0'))
               || encode(text) AS content
        FROM documents
    ),
    h AS (SELECT media_id, md5(hex(content)) AS hh FROM media)
    SELECT media_id,
           array_to_string(list_transform(generate_series(0, 15), i ->
               (strpos('0123456789abcdef', substr(hh, 2*i + 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hh, 2*i + 2, 1)) - 1)
           ), ',') AS embedding
    FROM h
    """,
    doc="Feature-extraction stub: media -> int8-quantized embedding via "
        "mapInPandas, the contract a real image/audio encoder drops "
        "into. Oracle rebuilds the payload and re-derives every "
        "embedding byte from md5-over-hex in pure SQL.",
    tags=("X19", "X24", "X17"),
)
def multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    emb = M.embed_media(M.build_media_from_documents(docs))
    # CSV-joined embedding: the driver canonicalizer needs hashable
    # scalar cells (array cells crashed it in round 1).
    return emb.select(
        "media_id",
        F.array_join(F.transform("embedding",
                                 lambda x: x.cast("string")),
                     ",").alias("embedding"))


# --------------------------------------------------------------------------
# X24: the Python UDF surface — scalar pandas_udf + grouped-agg
# pandas_udf in one query, hash-checked against a pure-SQL oracle.
# (mapInPandas is exercised by multimodal_decode and the REST fetcher;
# applyInPandas by udf_zscore below.)
# --------------------------------------------------------------------------
@register(
    "udf_surface_stats",
    """
    WITH scored AS (
        SELECT lang, n_chars,
               LN(1 + n_chars) * (CASE WHEN lang = 'en' THEN 1.1 ELSE 1.0 END)
               AS score
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n,
           ROUND(SUM(score * n_chars) / SUM(n_chars), 6) AS weighted_score
    FROM scored
    GROUP BY lang
    """,
    doc="Scalar pandas_udf (Arrow-vectorized) + GROUPED_AGG pandas_udf, "
        "oracle-checked against the same formulas in SQL.",
    tags=("X24",),
)
def udf_surface_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def score(lang: pd.Series, n_chars: pd.Series) -> pd.Series:
        return np.log1p(n_chars) * np.where(lang == "en", 1.1, 1.0)

    @pandas_udf("double")
    def weighted_avg(score: pd.Series, weight: pd.Series) -> float:
        return float((score * weight).sum() / weight.sum())

    @pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        # GROUPED_AGG pandas UDFs can't mix with built-in aggregates in
        # one agg() — so the count is a pandas agg too.
        return len(v)

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("score", score("lang", "n_chars"))
        .groupBy("lang")
        .agg(pd_count("doc_id").alias("n"),
             F.round(weighted_avg("score", "n_chars"), 6)
             .alias("weighted_score"))
    )


@register(
    "udf_zscore_groups",
    """
    SELECT doc_id, source,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY source)) /
                 NULLIF(STDDEV_SAMP(n_chars) OVER (PARTITION BY source), 0),
                 6) AS z
    FROM documents
    """,
    doc="applyInPandas grouped-map (per-group pandas frame in/out), "
        "oracle-checked against the window formulation.",
    tags=("X24",),
)
def udf_zscore_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["n_chars"].std(ddof=1)
        z = (pdf["n_chars"] - pdf["n_chars"].mean()) / std if std else None
        return pd.DataFrame({
            "doc_id": pdf["doc_id"], "source": pdf["source"],
            "z": z.round(6) if std else pd.Series([None] * len(pdf)),
        })

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").applyInPandas(
        zscore, schema="doc_id long, source string, z double")


# --------------------------------------------------------------------------
# X14 maps: map construction/access/introspection.
# --------------------------------------------------------------------------
@register(
    "map_battery",
    """
    WITH m AS (
        SELECT o_orderkey,
               MAP {'status': o_orderstatus, 'pri': o_orderpriority} AS props
        FROM orders WHERE o_orderkey % 25 = 0
    )
    SELECT o_orderkey,
           props['status'][1] AS status_val,
           props['pri'][1] AS pri_val,
           array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted,
           CAST(cardinality(props) AS BIGINT) AS n_keys
    FROM m
    """,
    doc="MapType column: map_from_arrays, element access, keys, size.",
    tags=("X14",),
)
def map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    props = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("pri"), F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        props["status"].alias("status_val"),
        props["pri"].alias("pri_val"),
        # CSV-joined so the driver canonicalizer gets a hashable scalar
        # cell (arrays crash its pandas sort_values — round-1 red row).
        F.array_join(F.array_sort(F.map_keys(props)), ",").alias("keys_sorted"),
        F.size(props).cast("long").alias("n_keys"),
    )


# --------------------------------------------------------------------------
# X89: perceptual near-dup detection on MEDIA columns — the multimodal
# twin of text MinHash. aHash signatures come out of the Arrow decode
# UDF; candidates from 4x16-bit band buckets (JVM-side, the SimHash
# idiom); hamming verify only on candidates. The corpus plants
# "re-encoded" copies whose every code point is shifted by +1 — the
# brightness-shift invariance aHash is FAMOUS for (a uniform shift
# cancels exactly in the cross-multiplied mean comparison, so planted
# pairs land at hamming 0 while the nearest natural pair sits at 10).
# The integer-exact chunk comparison makes the whole perceptual
# pipeline SQL-replayable, so the dedup is hash-checked, not demoed.
# --------------------------------------------------------------------------
# <= 3 with 4 bands keeps the pigeonhole recall guarantee: a pair
# within hamming 3 has at most 3 differing bands, so at least one of
# the 4 bands matches and the pair is ALWAYS a candidate (r3 advisor:
# at 4 the guarantee voids — 4 bits, one per band, share no band).
AHASH_MAX_HAMMING = 3
AHASH_N_PLANT = 40
AHASH_PLANT_OFFSET = 1_000_000


def _ahash_oracle() -> str:
    bands = " OR ".join([
        "(a.h1 & 65535) = (b.h1 & 65535)",
        "((a.h1 >> 16) & 65535) = ((b.h1 >> 16) & 65535)",
        "((a.h1 >> 32) & 65535) = ((b.h1 >> 32) & 65535)",
        "(((a.h1 >> 48) & 4095) | (a.h2 << 12)) = "
        "(((b.h1 >> 48) & 4095) | (b.h2 << 12))",
    ])
    return f"""
    WITH corpus AS (
        SELECT doc_id, text, 0 AS sh FROM documents
        UNION ALL
        SELECT doc_id + {AHASH_PLANT_OFFSET}, text, 1 FROM documents
        WHERE doc_id < {AHASH_N_PLANT}
    ),
    d AS (SELECT doc_id, text, sh, length(text) AS L FROM corpus
          WHERE length(text) > 0),
    ch AS (
        SELECT doc_id, L, sh, unnest(range(1, L + 1)) AS i, text
        FROM d
    ),
    cs AS (
        SELECT doc_id, ((i - 1) * 64) // L AS k,
               SUM(unicode(substr(text, CAST(i AS INTEGER), 1)) + sh) AS s,
               COUNT(*) AS n
        FROM ch GROUP BY doc_id, ((i - 1) * 64) // L
    ),
    tot AS (SELECT doc_id, SUM(s) AS ts, SUM(n) AS tn
            FROM cs GROUP BY doc_id),
    bits AS (
        SELECT cs.doc_id, k,
               CASE WHEN s * tn > ts * n THEN 1::BIGINT ELSE 0 END AS bit
        FROM cs JOIN tot ON cs.doc_id = tot.doc_id
    ),
    h AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN k < 60 THEN bit << k ELSE 0 END)
                    AS BIGINT) AS h1,
               CAST(SUM(CASE WHEN k >= 60 THEN bit << (k - 60) ELSE 0 END)
                    AS BIGINT) AS h2
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
                AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
          <= {AHASH_MAX_HAMMING}
      AND ({bands})
    """


@register(
    "multimodal_ahash_dedup",
    _ahash_oracle(),
    doc=f"X89 perceptual near-dup media pairs: average-hash signatures "
        "from the Arrow-batched decode UDF (64 payload chunks, bit = "
        "chunk mean > global mean via cross-multiplied INTEGER sums — "
        "no float means, so the perceptual hash is SQL-replayable), "
        "4x16-bit band buckets for candidates, hamming <= "
        f"{AHASH_MAX_HAMMING} verify on candidates only. The corpus "
        f"plants {AHASH_N_PLANT} re-encoded copies with every code "
        "point shifted +1 — the brightness-shift invariance aHash "
        "exists for (uniform shifts cancel exactly in the integer "
        "mean comparison), so every plant must surface at hamming 0 "
        "while the nearest natural pair sits at 10. The oracle "
        "brute-forces pairs under the identical band + hamming "
        "predicate, certifying the banded pipeline end to end.",
    tags=("X89", "X19", "X16", "X24"),
)
def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StringType

    from ..caching import persist_tracked

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    @pandas_udf(StringType())
    def brighten(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: "".join(chr(ord(c) + 1) for c in t))

    plants = (docs.filter(F.col("doc_id") < AHASH_N_PLANT)
              .select((F.col("doc_id") + AHASH_PLANT_OFFSET).alias("doc_id"),
                      brighten(F.col("text")).alias("text"),
                      "source", "lang",
                      # header width differs too, so a bytewise
                      # content-md5 match could never find these pairs
                      # — only the perceptual hash can
                      (F.col("n_chars") + 1).alias("n_chars")))
    corpus = docs.select("doc_id", "text", "source", "lang", "n_chars")         .unionByName(plants)
    media = M.build_media_from_documents(corpus)
    sig = persist_tracked(M.perceptual_ahash(media))
    bands = M.ahash_band_cols(F.col("h1"), F.col("h2"))
    keyed = sig.select(
        "media_id", "h1", "h2",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), b.alias("key"))
            for i, b in enumerate(bands)])).alias("bk"))         .select("media_id", "h1", "h2",
                F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = keyed.select(F.col("media_id").alias("id_a"),
                     F.col("h1").alias("h1a"), F.col("h2").alias("h2a"),
                     "band", "key")
    b = keyed.select(F.col("media_id").alias("id_b"),
                     F.col("h1").alias("h1b"), F.col("h2").alias("h2b"),
                     "band", "key")
    ham = (F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
           + F.bit_count(F.col("h2a").bitwiseXOR(F.col("h2b"))))
    return (a.join(b, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.cast("long").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= AHASH_MAX_HAMMING))


# --------------------------------------------------------------------------
# X91: silence segmentation on audio media — runs of low-amplitude
# samples become (start, end) segments via the gap-and-island trick
# (pos - row_number is constant within a run), entirely on the decoded
# sample stream. The islands window partitions BY MEDIA, so no window
# ever spans more than one recording — the bounded-window argument that
# makes it safe at any corpus size.
# --------------------------------------------------------------------------
SILENCE_THRESHOLD = 101   # sample value (code point) strictly below
SILENCE_MIN_LEN = 3       # minimum run length to report


@register(
    "multimodal_silence_segments",
    f"""
    WITH wav AS (
        SELECT doc_id AS media_id, text, length(text) AS L
        FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    ),
    samples AS (
        SELECT media_id, unnest(range(1, L + 1)) AS pos, text
        FROM wav
    ),
    quiet AS (
        SELECT media_id, pos
        FROM samples
        WHERE unicode(substr(text, CAST(pos AS INTEGER), 1))
              < {SILENCE_THRESHOLD}
    ),
    isl AS (
        SELECT media_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY media_id
                                        ORDER BY pos) AS grp
        FROM quiet
    )
    SELECT media_id, CAST(MIN(pos) AS BIGINT) AS seg_start,
           CAST(MAX(pos) AS BIGINT) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS seg_len
    FROM isl GROUP BY media_id, grp
    HAVING COUNT(*) >= {SILENCE_MIN_LEN}
    """,
    doc=f"X91 silence segmentation for audio media: decoded samples "
        f"below {SILENCE_THRESHOLD} collapse into maximal runs via "
        "gap-and-island (pos - row_number constant within a run), "
        f"keeping runs of length >= {SILENCE_MIN_LEN}. All windows "
        "partition by media_id, so nothing ever spans one recording — "
        "the per-media bounded-window shape. The preprocessing step "
        "behind voice-activity detection and audio chunking for ASR "
        "training data; with a real decoder only the amplitude source "
        "changes.",
    tags=("X91", "X19", "X11", "X24"),
)
def multimodal_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    media = M.build_media_from_documents(docs).filter(
        M.sniff_mime(F.col("content")) == "audio/wav")

    # Arrow decode: payload bytes -> per-sample rows (media_id, pos, amp)
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("pos", LongType()),
        StructField("amp", IntegerType()),
    ])

    # Vectorized expansion (r9 optimization, guide §4.2): one NumPy
    # repeat/concatenate per batch instead of a Python append per
    # sample; code points via the utf-32-le round-trip (== ord()).
    def run(batches):
        import numpy as np
        for pdf in batches:
            codes = [np.frombuffer(
                bytes(b)[12:].decode("utf-8").encode("utf-32-le"),
                dtype="<u4").astype(np.int32) for b in pdf["content"]]
            # dtype pinned (r9 ADVICE): np.array([]) defaults to float64,
            # and np.repeat then raises on an empty batch.
            lens = np.array([len(c) for c in codes], dtype=np.int64)
            yield pd.DataFrame({
                "media_id": np.repeat(pdf["media_id"].to_numpy(), lens),
                "pos": np.concatenate(
                    [np.arange(1, n + 1, dtype=np.int64)
                     for n in lens]) if len(lens) else
                np.array([], dtype=np.int64),
                "amp": np.concatenate(codes) if codes else
                np.array([], dtype=np.int32)})

    samples = media.select("media_id", "content").mapInPandas(run, out_schema)
    quiet = samples.filter(F.col("amp") < SILENCE_THRESHOLD)
    w = Window.partitionBy("media_id").orderBy("pos")
    isl = quiet.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (isl.groupBy("media_id", "grp")
            .agg(F.min("pos").cast("long").alias("seg_start"),
                 F.max("pos").cast("long").alias("seg_end"),
                 F.count("*").cast("long").alias("seg_len"))
            .filter(F.col("seg_len") >= SILENCE_MIN_LEN)
            .select("media_id", "seg_start", "seg_end", "seg_len"))


# --------------------------------------------------------------------------
# X172: scene-change detection on MEDIA columns — the video-curation
# primitive (shot segmentation before frame sampling; X19's frame
# sampler emits every k-th frame, this finds the CUT points): frames
# are fixed-width chunks of the decoded payload, per-frame
# "brightness" is the integer sum of code units (computed in the
# Arrow-batched decode UDF — the real-decoder slot), and a cut fires
# where consecutive frame MEANS differ by more than SCENE_THRESH
# units, decided by exact cross-multiplication
# |s_f * n_prev - s_prev * n_f| > SCENE_THRESH * n_f * n_prev —
# no float means anywhere, so the whole detector is SQL-replayable
# on the text twin of the payload (ASCII corpus: byte == code point,
# the X89 equivalence). Per media: frames, cuts, scenes, the largest
# jump. Windows are per-media (frame_no ordered) — never global.
# --------------------------------------------------------------------------
SCENE_FRAME = 64   # payload chars per frame
SCENE_THRESH = 4   # mean code-unit jump that opens a new scene


@register(
    "multimodal_scene_changes",
    f"""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents
               WHERE length(text) > 0),
    ch AS (SELECT doc_id, unnest(range(1, L + 1)) AS i, text FROM d),
    fr AS (
        SELECT doc_id, (i - 1) // {SCENE_FRAME} AS f,
               CAST(SUM(unicode(substr(text, CAST(i AS INTEGER), 1)))
                    AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ch GROUP BY doc_id, (i - 1) // {SCENE_FRAME}
    ),
    lagged AS (
        SELECT doc_id, f, s, n,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY f) AS sp,
               LAG(n) OVER (PARTITION BY doc_id ORDER BY f) AS np
        FROM fr
    ),
    cuts AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN sp IS NOT NULL
                              AND ABS(s * np - sp * n)
                                  > {SCENE_THRESH} * n * np
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
               MAX(CASE WHEN sp IS NOT NULL
                        THEN ROUND(ABS(CAST(s AS DOUBLE) / n
                                       - CAST(sp AS DOUBLE) / np), 6)
                        END) AS max_jump
        FROM lagged GROUP BY doc_id
    )
    SELECT doc_id AS media_id, n_frames, n_cuts,
           n_cuts + 1 AS n_scenes, max_jump
    FROM cuts ORDER BY media_id
    """,
    doc=f"X172 scene-change detection: {SCENE_FRAME}-char payload "
        "frames from the Arrow decode UDF, integer frame sums, cuts "
        f"where consecutive means differ > {SCENE_THRESH} units via "
        "exact cross-multiplication (no float means), per-media "
        "windows. Frames/cuts/scenes hash-checked; max_jump is the "
        "only double (a ROUNDed division of identical BIGINTs).",
    tags=("X172", "X19", "X24", "X89", "X10"),
)
def multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (LongType, StructField, StructType)

    from ..catalog import load_table
    from ..operators.multimodal import build_media_from_documents

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.length("text") > 0)
    media = build_media_from_documents(docs)

    frame_schema = StructType([
        StructField("media_id", LongType()),
        StructField("f", LongType()),
        StructField("s", LongType()),
        StructField("n", LongType()),
    ])

    # Vectorized kernel (r10, guide §4.2): frame sums via one
    # np.add.reduceat over the batch's concatenated payload bytes
    # instead of a Python sum() per frame — exact integer arithmetic
    # (uint8 -> int64), identical (media_id, f, s, n) rows. Frames are
    # contiguous within a media and medias contiguous in the joined
    # buffer, so the global frame-start offsets are reduceat boundaries.
    def frame_stats(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            payloads = [bytes(b)[12:] for b in pdf["content"]]
            plens = np.array([len(p) for p in payloads], dtype=np.int64)
            nfs = -(-plens // SCENE_FRAME)               # ceil
            ids = np.repeat(pdf["media_id"].to_numpy(), nfs)
            starts = np.repeat(np.cumsum(nfs) - nfs, nfs)
            fs = np.arange(len(ids), dtype=np.int64) - starts
            if len(ids):
                arr = np.frombuffer(b"".join(payloads),
                                    dtype=np.uint8).astype(np.int64)
                offs = np.repeat(np.cumsum(plens) - plens, nfs)
                ss = np.add.reduceat(arr, offs + fs * SCENE_FRAME)
                ns = np.minimum(SCENE_FRAME,
                                np.repeat(plens, nfs) - fs * SCENE_FRAME)
            else:
                ss = np.array([], dtype=np.int64)
                ns = ss
            yield pd.DataFrame({"media_id": ids, "f": fs,
                                "s": ss, "n": ns})

    fr = media.select("media_id", "content") \
        .mapInPandas(frame_stats, frame_schema)
    from pyspark.sql import Window
    w = Window.partitionBy("media_id").orderBy("f")
    lagged = fr.select(
        "media_id", "f", "s", "n",
        F.lag("s").over(w).alias("sp"),
        F.lag("n").over(w).alias("np"))
    cut = (F.col("sp").isNotNull()
           & (F.abs(F.col("s") * F.col("np") - F.col("sp") * F.col("n"))
              > SCENE_THRESH * F.col("n") * F.col("np")))
    jump = F.when(F.col("sp").isNotNull(),
                  F.round(F.abs(F.col("s").cast("double") / F.col("n")
                                - F.col("sp").cast("double")
                                / F.col("np")), 6))
    out = (lagged.groupBy("media_id")
           .agg(F.count("*").cast("long").alias("n_frames"),
                F.sum(F.when(cut, 1).otherwise(0)).cast("long")
                .alias("n_cuts"),
                F.max(jump).alias("max_jump")))
    return (out.select("media_id", "n_frames", "n_cuts",
                       (F.col("n_cuts") + 1).cast("long")
                       .alias("n_scenes"), "max_jump")
            .orderBy("media_id"))


# --------------------------------------------------------------------------
# X223: DCT perceptual hash (pHash) dedup — the frequency-domain
# upgrade over X89's aHash: aHash thresholds chunk means (robust to
# uniform brightness shifts), pHash thresholds low-frequency DCT
# coefficients against their own median (robust to CONTRAST scaling —
# coefficients are linear in pixels, so scaling preserves every bit
# exactly; the planted x2-contrast copies must surface at hamming 0
# while header-level md5 matching can never find them). 3 x 5-bit
# bands make candidate generation lossless at hamming <= 2 by
# pigeonhole; a real 32x32 decode gives the 63-bit classic with 4x16
# bands — identical structure.
# --------------------------------------------------------------------------
PHASH_N_PLANT = 40
PHASH_PLANT_OFFSET = 2_000_000
PHASH_MAX_HAMMING = 2


def _phash_oracle() -> str:
    tvals = ", ".join(
        f"({u}, {x}, {M.PHASH_DCT[u][x]})"
        for u in range(4) for x in range(8))
    bands = " OR ".join(
        f"((a.ph >> {5 * i}) & 31) = ((b.ph >> {5 * i}) & 31)"
        for i in range(3))
    return f"""
    WITH corpus AS (
        SELECT doc_id, text, 1 AS mult FROM documents
        UNION ALL
        SELECT doc_id + {PHASH_PLANT_OFFSET}, text, 2 FROM documents
        WHERE doc_id < {PHASH_N_PLANT}
    ),
    d AS (SELECT doc_id, text, mult, length(text) AS L FROM corpus
          WHERE length(text) > 0),
    ch AS (
        SELECT doc_id, L, mult, unnest(range(1, L + 1)) AS i, text
        FROM d
    ),
    cs AS (
        SELECT doc_id, ((i - 1) * 64) // L AS k,
               CAST(SUM(unicode(substr(text, CAST(i AS INTEGER), 1))
                        * mult) AS BIGINT) AS s
        FROM ch GROUP BY doc_id, ((i - 1) * 64) // L
    ),
    t(u, x, t) AS (VALUES {tvals}),
    co AS (
        SELECT cs.doc_id, tu.u, tv.u AS v,
               CAST(SUM(cs.s * tu.t * tv.t) AS BIGINT) AS c
        FROM cs
        JOIN t tu ON tu.x = cs.k % 8
        JOIN t tv ON tv.x = cs.k // 8
        WHERE NOT (tu.u = 0 AND tv.u = 0)
        GROUP BY cs.doc_id, tu.u, tv.u
    ),
    th AS (
        SELECT doc_id, c AS theta FROM (
            SELECT doc_id, c, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY c, u, v) AS rn
            FROM co
        ) WHERE rn = 8
    ),
    h AS (
        SELECT co.doc_id,
               CAST(SUM(CASE WHEN co.c > th.theta
                             THEN 1::BIGINT << (co.u * 4 + co.v - 1)
                             ELSE 0 END) AS BIGINT) AS ph
        FROM co JOIN th ON th.doc_id = co.doc_id
        GROUP BY co.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ph, b.ph)) <= {PHASH_MAX_HAMMING}
      AND ({bands})
    """


@register(
    "multimodal_phash_dedup",
    _phash_oracle(),
    doc=f"X223 DCT perceptual-hash near-dup media pairs: 8x8 chunk-sum "
        "pixels from the Arrow decode UDF, scaled-integer 2-D DCT "
        "(shared Python-precomputed cosine table), low-frequency 4x4 "
        "block thresholded at its exact integer 8th-smallest "
        f"coefficient; 3x5-bit bands (lossless at hamming <= "
        f"{PHASH_MAX_HAMMING}); {PHASH_N_PLANT} planted x2-CONTRAST "
        "copies must surface at hamming 0 — the invariance class "
        "aHash lacks. Oracle brute-forces pairs under the identical "
        "band + hamming predicate.",
    tags=("X223", "X89", "X19", "X16", "X24"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StringType

    from ..caching import persist_tracked

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    @pandas_udf(StringType())
    def contrast2(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: "".join(chr(ord(c) * 2) for c in t))

    plants = (docs.filter(F.col("doc_id") < PHASH_N_PLANT)
              .select((F.col("doc_id") + PHASH_PLANT_OFFSET)
                      .alias("doc_id"),
                      contrast2(F.col("text")).alias("text"),
                      "source", "lang", "n_chars"))
    corpus = docs.select("doc_id", "text", "source", "lang", "n_chars") \
        .unionByName(plants)
    media = M.build_media_from_documents(corpus)
    sig = persist_tracked(M.perceptual_phash(media))
    keyed = sig.select(
        "media_id", "ph",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     ((F.col("ph").bitwiseAND(F.lit(31 << (5 * i))))
                      ).alias("key"))
            for i in range(3)])).alias("bk")) \
        .select("media_id", "ph", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"))
    a = keyed.select(F.col("media_id").alias("id_a"),
                     F.col("ph").alias("pha"), "band", "key")
    b = keyed.select(F.col("media_id").alias("id_b"),
                     F.col("ph").alias("phb"), "band", "key")
    ham = F.bit_count(F.col("pha").bitwiseXOR(F.col("phb")))
    return (a.join(b, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.cast("long").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= PHASH_MAX_HAMMING))
