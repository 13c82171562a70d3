"""Multimodal (image/audio/video) column plumbing.

The reference downloads app icons and post-processes them (strip
corrupt PNG chunks, RGB convert, LANCZOS resize to 128/64, perceptual-
hash naming — /root/reference/adscrawler/app_stores/process_icons.py:51-219).
This engine treats media as opaque ``binary`` columns with typed
metadata and runs decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over ``mapInPandas``.

The image/audio codec libraries are NOT present in this container, so
the codec step is stubbed: synthetic media carries a deterministic
16-byte header (magic, width, height, sample_rate, n_frames) that the
"decoder" parses; feeding real codec bytes raises NotImplementedError
at the clearly-marked point where PIL/ffmpeg would plug in.  Everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shapes —
is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"SYNM"
_HDR = struct.Struct("<4sHHIi")  # magic, width, height, sample_rate, n_frames

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)


def pack_media(width: int, height: int, sample_rate: int, n_frames: int,
               payload: bytes) -> bytes:
    return _HDR.pack(MAGIC, width, height, sample_rate, n_frames) + payload


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: payload bytes derived from md5 chains
    (JVM-side unhex), header packed by a vectorized pandas UDF."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(4)) + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat(
            *[F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"),
                             F.lit(i))) for i in range(8)]
        )
    )
    base = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.concat(F.lit("doc"), F.pmod(F.col("id"), F.lit(max(1, n // 3)))).alias("doc_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        (16 + F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit(1)), F.lit(497))).cast("int").alias("width"),
        (16 + F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit(2)), F.lit(497))).cast("int").alias("height"),
        F.when(F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(4)) >= 2, 16000)
        .otherwise(0).cast("int").alias("sample_rate"),
        (1 + F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit(3)), F.lit(30))).cast("int").alias("n_frames"),
    )

    @F.pandas_udf(BinaryType())
    def pack(width: pd.Series, height: pd.Series, rate: pd.Series,
             frames: pd.Series, payload: pd.Series) -> pd.Series:
        return pd.Series(
            [
                pack_media(int(w), int(h), int(r), int(f), bytes(p))
                for w, h, r, f, p in zip(width, height, rate, frames, payload)
            ]
        )

    return base.select(
        "media_id", "doc_id", "kind",
        pack("width", "height", "sample_rate", "n_frames", "payload").alias("content"),
        "width", "height", "sample_rate", "n_frames",
        F.lit("synm").alias("format"),
    )


def _parse_header(content: bytes) -> tuple[int, int, int, int, bytes]:
    if content[:4] != MAGIC:
        # >>> real-codec plug point: PIL.Image.open / ffmpeg would go
        # here; the container has neither, so non-synthetic bytes are
        # explicitly unsupported rather than silently mangled.
        raise NotImplementedError(
            "real image/audio codecs unavailable in this environment"
        )
    magic, w, h, sr, nf = _HDR.unpack(content[: _HDR.size])
    return w, h, sr, nf, content[_HDR.size:]


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("dec_width", IntegerType()),
        StructField("dec_height", IntegerType()),
        StructField("dec_sample_rate", IntegerType()),
        StructField("dec_n_frames", IntegerType()),
        StructField("payload_bytes", IntegerType()),
    ]
)


def decode(media: DataFrame) -> DataFrame:
    """Decode stage: header parse per media row (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                w, h, sr, nf, payload = _parse_header(bytes(content))
                rows.append((mid, kind, w, h, sr, nf, len(payload)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, DECODED_SCHEMA
    )


@F.pandas_udf(ArrayType(FloatType()))
def media_features(content: pd.Series) -> pd.Series:
    """8-dim deterministic feature vector from payload byte statistics
    (stand-in for an image/audio embedding model)."""
    out = []
    for c in content:
        _w, _h, _sr, _nf, payload = _parse_header(bytes(c))
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        out.append(
            [
                float(arr.mean()),
                float(arr.std()),
                float(arr.min()),
                float(arr.max()),
                float(np.median(arr)),
                float((arr > 128).mean()),
                float(arr[:16].mean()),
                float(arr[-16:].mean()),
            ]
        )
    return pd.Series(out)


@F.pandas_udf(StringType())
def phash(content: pd.Series) -> pd.Series:
    """Perceptual-hash stand-in (reference names icons '{phash}_128.png',
    process_icons.py:164): 16-hex digest of the payload's 8x8 mean-
    threshold bit grid — deterministic function of the bytes."""
    out = []
    for c in content:
        _w, _h, _sr, _nf, payload = _parse_header(bytes(c))
        arr = np.frombuffer(payload, dtype=np.uint8)[:64].astype(np.float32)
        if len(arr) < 64:
            arr = np.pad(arr, (0, 64 - len(arr)))
        bits = (arr > arr.mean()).astype(np.uint64)
        val = np.uint64(0)
        for b in bits:
            val = (val << np.uint64(1)) | b
        out.append(f"{int(val):016x}")
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def resize_image(content: pd.Series) -> pd.Series:
    """Resize-to-128 stand-in: rewrites the header dims and truncates
    the payload deterministically (LANCZOS would plug in here)."""
    out = []
    for c in content:
        _w, _h, sr, nf, payload = _parse_header(bytes(c))
        out.append(pack_media(128, 128, sr, nf, payload[:64]))
    return pd.Series(out)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 5, fps: int = 10) -> DataFrame:
    """Video frame sampling: one output row per every_n-th frame
    (mapInPandas fan-out; frame payload is a deterministic byte slice)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _w, _h, _sr, nf, payload = _parse_header(bytes(content))
                for i in range(0, nf, every_n):
                    lo = (i * 7) % max(1, len(payload) - 8)
                    rows.append((mid, i, i * 1000 // fps, payload[lo:lo + 8]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, FRAME_SCHEMA)
    )


# ---------------------------------------------------------------------
# Creative phash pipeline (mitm_ad_parser/creative_processor.py)
# ---------------------------------------------------------------------

# get_phash (creative_processor.py:80-84): formats whose phash comes
# from multiple seeked frames rather than a single decode.
SEEKABLE_FORMATS = ("mp4", "webm", "gif")
PHASH_SECONDS = (1, 3, 5, 10)


def majority_hash(df: DataFrame, group_col: str, hash_col: str) -> DataFrame:
    """average_hashes (creative_processor.py:50-56): per group,
    majority-vote each of the 64 hash bits (ties round up, matching
    the reference's ``bits >= len/2``) and re-emit the 16-hex digest.

    JVM-side: the hex splits into two 32-bit halves, each bit becomes
    a conditional sum (64 partial-aggregable terms, one shuffle), and
    the majority longs reassemble with format_string — no Python in
    the hot path, so the vote scales like any other groupBy."""
    hi = F.conv(F.substring(F.col(hash_col), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.col(hash_col), 9, 8), 16, 10).cast("long")
    tmp = df.withColumn("_hi", hi).withColumn("_lo", lo)
    aggs = [F.count("*").alias("_n")]
    for half in ("_hi", "_lo"):
        for i in range(32):
            mask = 1 << i
            aggs.append(
                F.sum(
                    (F.col(half).bitwiseAND(F.lit(mask)) != 0).cast("int")
                ).alias(f"{half}{i}")
            )
    counted = tmp.groupBy(group_col).agg(*aggs)
    maj = {}
    for half in ("_hi", "_lo"):
        expr = F.lit(0).cast("long")
        for i in range(32):
            expr = expr + F.when(
                F.col(f"{half}{i}") * 2 >= F.col("_n"), F.lit(1 << i)
            ).otherwise(0).cast("long")
        maj[half] = expr
    return counted.select(
        F.col(group_col),
        F.format_string("%08x%08x", maj["_hi"], maj["_lo"]).alias(hash_col),
    )


def frames_at_seconds(
    media: DataFrame, seconds: tuple[int, ...] = PHASH_SECONDS
) -> DataFrame:
    """extract_frame_at over fixed seek points
    (creative_processor.py:23-48): one row per (media_id, second)
    that exists in the stream; a second past the end is the
    reference's failed-extraction case and yields no row.  The
    ffmpeg decode is the codec plug-point — frames are deterministic
    payload slices, as in sample_frames."""
    secs = list(seconds)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _w, _h, _sr, nf, payload = _parse_header(bytes(content))
                for s in secs:
                    if s >= nf:  # seek past end -> extraction fails
                        continue
                    lo = (s * 11) % max(1, len(payload) - 8)
                    rows.append((mid, s, payload[lo:lo + 8]))
            yield pd.DataFrame(rows, columns=["media_id", "second", "frame"])

    schema = StructType([
        StructField("media_id", StringType()),
        StructField("second", IntegerType()),
        StructField("frame", BinaryType()),
    ])
    return media.select("media_id", "content").mapInPandas(run, schema)


def creative_phashes(
    creatives: DataFrame,
    cached_assets: DataFrame | None = None,
    seconds: tuple[int, ...] = PHASH_SECONDS,
) -> DataFrame:
    """get_phash (creative_processor.py:70-90) as one plan over all
    creatives: reuse the cached phash when the asset table already
    has one; else seekable formats (mp4/webm/gif) take the majority
    vote over frame phashes at the seek points; everything else (and
    seekable files whose every seek failed) takes the single-decode
    phash.  ``creatives`` carries (md5_hash, file_extension,
    content); ``cached_assets`` carries (md5_hash, phash).

    The reference resolves one file per call against a collected
    cache; here the cache is a join and each tier is a column branch
    — no per-file round trips."""
    base = creatives.withColumnRenamed("md5_hash", "media_id")
    frames = frames_at_seconds(
        base.filter(F.col("file_extension").isin(*SEEKABLE_FORMATS)), seconds
    )
    multi = majority_hash(
        frames.withColumn(
            "frame_phash",
            phash(
                F.concat(
                    F.lit(pack_media(8, 8, 0, 1, b"")[: _HDR.size]),
                    F.col("frame"),
                )
            ),
        ).select("media_id", "frame_phash"),
        "media_id",
        "frame_phash",
    ).withColumnRenamed("frame_phash", "multi_phash")
    single = base.withColumn("single_phash", phash(F.col("content")))
    out = single.join(multi, "media_id", "left")
    if cached_assets is not None:
        out = out.join(
            cached_assets.select(
                F.col("md5_hash").alias("media_id"),
                F.col("phash").alias("cached_phash"),
            ),
            "media_id",
            "left",
        )
    else:
        out = out.withColumn("cached_phash", F.lit(None).cast("string"))
    return out.select(
        F.col("media_id").alias("md5_hash"),
        F.coalesce(
            F.col("cached_phash"),
            F.when(
                F.col("file_extension").isin(*SEEKABLE_FORMATS),
                F.col("multi_phash"),
            ),
            F.col("single_phash"),
        ).alias("phash"),
    )
