"""Multimodal columns (X19): image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

Real at this layer: the media struct schema, JVM-side metadata
extraction (magic-byte MIME sniffing, header field decoding, content
hashing), partitioning/batch shape, and the mapInPandas plumbing.
Stubbed: actual pixel/sample decoding — the container has no
image/audio libraries, so ``decode_media`` dispatches to a real decoder
when one is importable and otherwise to a clearly-marked deterministic
fake that parses our synthetic header format (keeping every test
runnable and the UDF signature/batch contract exercised).

Synthetic payload layout (build_media_from_documents):
    bytes 0-3   magic (PNG \\x89PNG / WAV RIFF / plain UTF8)
    bytes 4-7   width  (big-endian uint32)
    bytes 8-11  height (big-endian uint32)
    bytes 12-   UTF-8 payload
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

PNG_MAGIC = b"\x89PNG"
WAV_MAGIC = b"RIFF"

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("uri", StringType()),
    StructField("mime", StringType()),       # declared mime (may lie)
    StructField("content", BinaryType()),    # opaque payload
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_payload_bytes", LongType()),
    StructField("decoder", StringType()),
])


def _be32(col: Column) -> Column:
    """uint32 big-endian -> binary(4), JVM-side."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def build_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: every third
    row is WAV-tagged, others PNG; one in seven has a lying declared
    mime (sniffing must win)."""
    width = (F.col("n_chars") % 1024 + 1).cast("long")
    height = (F.col("doc_id") % 512 + 1).cast("long")
    magic = F.when(F.col("doc_id") % 3 == 0, F.lit(WAV_MAGIC)) \
             .otherwise(F.lit(PNG_MAGIC))
    declared = F.when(F.col("doc_id") % 7 == 0, F.lit("application/octet-stream")) \
                .when(F.col("doc_id") % 3 == 0, F.lit("audio/wav")) \
                .otherwise(F.lit("image/png"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("synthetic://"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("uri"),
        declared.alias("mime"),
        F.concat(magic, _be32(width), _be32(height),
                 F.encode("text", "UTF-8")).alias("content"),
    )


def sniff_mime(content: Column) -> Column:
    """Magic-byte MIME detection — pure JVM expression, no UDF."""
    head = F.substring(content, 1, 4)
    return (F.when(head == F.lit(PNG_MAGIC), "image/png")
            .when(head == F.lit(WAV_MAGIC), "audio/wav")
            .otherwise("application/octet-stream"))


def with_media_metadata(media: DataFrame,
                        content_col: str = "content") -> DataFrame:
    """Typed metadata extraction, all inside whole-stage codegen:
    sniffed mime, byte size, header width/height, content digest."""
    c = F.col(content_col)
    return media.withColumns({
        "mime_sniffed": sniff_mime(c),
        "size_bytes": F.octet_length(c).cast("long"),
        "width": F.conv(F.hex(F.substring(c, 5, 4)), 16, 10).cast("long"),
        "height": F.conv(F.hex(F.substring(c, 9, 4)), 16, 10).cast("long"),
        "content_md5": F.md5(c),
    })


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: parses the synthetic header instead of pixels.
    Replace with PIL/libav in an environment that ships them."""
    out = {"media_id": pdf["media_id"],
           "width": [int.from_bytes(b[4:8], "big") for b in pdf["content"]],
           "height": [int.from_bytes(b[8:12], "big") for b in pdf["content"]],
           "n_payload_bytes": [max(len(b) - 12, 0) for b in pdf["content"]],
           "decoder": "fake"}
    return pd.DataFrame(out)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas, always using the
    synthetic-header ``_fake_decode`` stub (the testdata payloads are
    not real images; a production deployment swaps the stub for a
    PIL/libav decoder with the same batch contract). Warns rather than
    erroring if PIL happens to be importable, since the stub is still
    the correct decoder for this corpus. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch — size it so
    batch_rows * max_payload fits executor memory at the target scale."""
    try:  # pragma: no cover - not installed in this container
        import PIL  # noqa: F401
        import warnings
        warnings.warn(
            "PIL is available but no real decoder is wired; using the "
            "synthetic-header stub decoder", RuntimeWarning, stacklevel=2)
    except ImportError:
        pass
    decode = _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode(pdf)

    return media.select("media_id", "content").mapInPandas(
        run, schema=DECODED_SCHEMA)


# -- resize / frame-sample / feature-extract --------------------------------
#
# Same stubbing stance as decode_media: the Spark-side plumbing (schemas,
# Arrow batch shape, 1->N row expansion, integer-exact arithmetic that an
# oracle can replay) is real; pixel work is a deterministic fake.

RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumb_w", IntegerType()),
    StructField("thumb_h", IntegerType()),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame_len", IntegerType()),
])

def resize_media(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Thumbnail-dimension computation via mapInPandas. Integer-only
    arithmetic (floor scaling, aspect preserved) so an oracle can replay
    it exactly; a real resampler (PIL.Image.thumbnail) slots into the
    same batch contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["content"].map(lambda b: int.from_bytes(b[4:8], "big"))
            h = pdf["content"].map(lambda b: int.from_bytes(b[8:12], "big"))
            m = pd.concat([w, h], axis=1).max(axis=1).clip(lower=1)
            scale_needed = m > max_dim
            tw = w.where(~scale_needed, (w * max_dim // m).clip(lower=1))
            th = h.where(~scale_needed, (h * max_dim // m).clip(lower=1))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": w.astype("int32"), "height": h.astype("int32"),
                "thumb_w": tw.astype("int32"), "thumb_h": th.astype("int32"),
            })

    return media.select("media_id", "content").mapInPandas(
        run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256,
                  every: int = 4) -> DataFrame:
    """Frame sampling as a 1->N mapInPandas expansion: the payload past
    the 12-byte header is cut into ``frame_bytes`` frames and every
    ``every``-th frame is emitted — the UDTF batch shape a real video
    frame sampler (per-keyframe decode) uses."""

    # Vectorized expansion (r10, guide §4.2): the per-frame Python loop
    # becomes one repeat/arange pass per batch — identical rows (every
    # ``every``-th frame number, tail frame length clipped), only the
    # O(1)-per-row len() survives in Python.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            plens = np.array([max(len(b) - 12, 0) for b in pdf["content"]],
                             dtype=np.int64)
            n_frames = -(-plens // frame_bytes)          # ceil
            n_sel = -(-n_frames // every)                # emitted per media
            ids = np.repeat(pdf["media_id"].to_numpy(), n_sel)
            starts = np.repeat(np.cumsum(n_sel) - n_sel, n_sel)
            fnos = (np.arange(len(ids), dtype=np.int64) - starts) * every
            flens = np.minimum(frame_bytes,
                               np.repeat(plens, n_sel) - fnos * frame_bytes)
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_no": pd.Series(fnos, dtype="int32"),
                                "frame_len": pd.Series(flens, dtype="int32")})

    return media.select("media_id", "content").mapInPandas(
        run, schema=FRAMES_SCHEMA)


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction stub: an md5-derived int8-quantized vector
    (byte values 0-255) stands in for a real image/audio encoder,
    through the identical mapInPandas -> array column contract the
    similarity suite consumes. The hash runs over the UPPERCASE HEX of
    the payload — the one encoding Spark's hex(), DuckDB's hex() and
    Python's bytes.hex() all agree on — so an SQL oracle can reproduce
    every output byte exactly."""
    import hashlib

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(LongType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            emb = pdf["content"].map(
                lambda b: [int(x) for x in hashlib.md5(
                    b.hex().upper().encode()).digest()[:dim]])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "embedding": emb})

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


AHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("h1", LongType()),   # perceptual-hash bits 0-59
    StructField("h2", LongType()),   # bits 60-63
])


def perceptual_ahash(media: DataFrame,
                     content_col: str = "content") -> DataFrame:
    """Average-hash (aHash) of the decoded payload via Arrow-batched
    mapInPandas — the perceptual-dedup signature for media columns.
    The payload stream splits into 64 contiguous chunks; bit k is set
    when chunk k's mean exceeds the global mean. All comparisons are
    cross-multiplied integer sums (no float means), so the signature
    is EXACTLY reproducible by a SQL twin — unusual for a perceptual
    hash, and what lets the dedup be hash-checked end to end. With a
    real decoder the chunk means come from pixel/sample values; the
    chunking, packing and banding stay identical."""
    cols = media.select(F.col("media_id"), F.col(content_col).alias("c"))

    # Vectorized kernel (r9 optimization, guide §4.2): the original
    # per-character Python loop dominated the stage; NumPy reproduces
    # the identical integer arithmetic. Code points via a utf-32-le
    # round-trip (== ord() per char); chunk sums/counts via bincount
    # (integer-valued float64, exact below 2^53 — payload sums here are
    # ~1e7); the bit rule stays the cross-multiplied int64 compare.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        w1 = np.int64(1) << np.arange(60, dtype=np.int64)
        w2 = np.int64(1) << np.arange(4, dtype=np.int64)
        for pdf in batches:
            h1s, h2s = [], []
            for b in pdf["c"]:
                codes = np.frombuffer(
                    bytes(b)[12:].decode("utf-8").encode("utf-32-le"),
                    dtype="<u4").astype(np.int64)
                L = len(codes)
                if L == 0:
                    h1s.append(0); h2s.append(0)
                    continue
                if L > 2_500_000:
                    # Exactness bound (r9 ADVICE): the bit rule
                    # sums * L > ts * cnts is int64-exact only while
                    # L^2 * max_codepoint < 2^63 (L <~ 2.9e6). The old
                    # per-char loop used arbitrary-precision ints; fail
                    # loudly rather than wrap silently past the bound.
                    raise ValueError(
                        f"perceptual_ahash payload of {L} chars exceeds "
                        "the int64 exactness bound (2.5e6)")
                idx = (np.arange(L, dtype=np.int64) * 64) // L
                sums = np.bincount(idx, weights=codes,
                                   minlength=64).astype(np.int64)
                cnts = np.bincount(idx, minlength=64).astype(np.int64)
                ts = int(sums.sum())
                bits = (sums * L > ts * cnts).astype(np.int64)
                h1s.append(int((bits[:60] * w1).sum()))
                h2s.append(int((bits[60:] * w2).sum()))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "h1": h1s, "h2": h2s})

    return cols.mapInPandas(run, AHASH_SCHEMA)


def ahash_band_cols(h1: Column, h2: Column) -> list[Column]:
    """4 x 16-bit LSH bands over the packed (h1 bits 0-59, h2 bits
    60-63) signature."""
    m16 = F.lit(0xFFFF)
    return [
        h1.bitwiseAND(m16),
        F.shiftrightunsigned(h1, 16).bitwiseAND(m16),
        F.shiftrightunsigned(h1, 32).bitwiseAND(m16),
        F.shiftrightunsigned(h1, 48).bitwiseAND(F.lit(0xFFF))
        .bitwiseOR(F.shiftleft(h2, 12)),
    ]


# DCT-II cosine table round(cos(pi*(2x+1)*u/16)*1000), u=0..3, x=0..7 —
# Python-precomputed integers inlined into BOTH engines (X160 pattern).
PHASH_DCT = (
    (1000, 1000, 1000, 1000, 1000, 1000, 1000, 1000),
    (981, 831, 556, 195, -195, -556, -831, -981),
    (924, 383, -383, -924, -924, -383, 383, 924),
    (831, -195, -981, -556, 556, 981, 195, -831),
)
PHASH_SCHEMA = "media_id long, ph long"


def perceptual_phash(media: DataFrame,
                     content_col: str = "content") -> DataFrame:
    """DCT perceptual hash (pHash) of the decoded payload via
    Arrow-batched mapInPandas: 64 contiguous chunk sums form an 8x8
    "image", a scaled-integer 2-D DCT keeps the top-left 4x4
    low-frequency block, the DC coefficient is dropped, and bit i is
    set when coefficient i exceeds the 8th-smallest of the 15 (an
    exact integer threshold). Coefficients are LINEAR in pixel values,
    so contrast scaling preserves every bit exactly — the invariance
    aHash (X89, mean-threshold) does not have. 15-bit hash here
    because the fake decode yields 8x8 pixels; a real 32x32 decode
    gives the classic 63-bit pHash with identical structure."""
    cols = media.select(F.col("media_id"), F.col(content_col).alias("c"))
    T = PHASH_DCT

    # Vectorized kernel (r9 optimization, guide §4.2): same integer
    # math as the original per-character loop — code points via a
    # utf-32-le round-trip (== ord()), chunk sums via bincount (exact
    # below 2^53), the 15 DCT coefficients as one int64 matvec against
    # the precomputed (15, 64) basis (|term| <= px * 1e6, far inside
    # int64), theta as the 8th-smallest coefficient VALUE (ties in s
    # give the same value whatever (u, v) order broke them).
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        basis = np.array(
            [[T[u][k % 8] * T[v][k // 8] for k in range(64)]
             for u in range(4) for v in range(4) if (u, v) != (0, 0)],
            dtype=np.int64)
        shifts = np.array([u * 4 + v - 1
                           for u in range(4) for v in range(4)
                           if (u, v) != (0, 0)], dtype=np.int64)
        for pdf in batches:
            out = []
            for b in pdf["c"]:
                codes = np.frombuffer(
                    bytes(b)[12:].decode("utf-8").encode("utf-32-le"),
                    dtype="<u4").astype(np.int64)
                L = len(codes)
                if L == 0:
                    out.append(0)
                    continue
                if L > 7_000_000:
                    # Exactness bound (r9 ADVICE): |basis @ px| <=
                    # 1e6 * L * max_codepoint must stay inside int64
                    # (L <~ 8.4e6); raise instead of wrapping silently.
                    raise ValueError(
                        f"perceptual_phash payload of {L} chars exceeds "
                        "the int64 exactness bound (7e6)")
                idx = (np.arange(L, dtype=np.int64) * 64) // L
                px = np.bincount(idx, weights=codes,
                                 minlength=64).astype(np.int64)
                s = basis @ px
                theta = np.partition(s, 7)[7]
                out.append(int(((s > theta).astype(np.int64)
                                << shifts).sum()))
            yield pd.DataFrame({"media_id": pdf["media_id"], "ph": out})

    return cols.mapInPandas(run, PHASH_SCHEMA)
