"""Tests for the creative phash pipeline (multimodal.py additions) —
parity vs a numpy restatement of the reference's average_hashes
(/root/reference/adscrawler/mitm_ad_parser/creative_processor.py:50-56)
and the get_phash cache/seekable/single decision ladder (:70-90)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import multimodal as MM


def _ref_average(hashes_hex):
    """average_hashes restated over 64-bit integer bit rows."""
    mats = []
    for h in hashes_hex:
        v = int(h, 16)
        mats.append(np.array([(v >> i) & 1 for i in range(64)], dtype=int))
    bits = sum(mats)
    majority = (bits >= (len(mats) / 2)).astype(int)
    out = 0
    for i in range(64):
        out |= int(majority[i]) << i
    return f"{out:016x}"


def test_majority_hash_parity(spark):
    import hashlib

    rows = []
    want = {}
    for g in range(6):
        hashes = [
            hashlib.md5(f"{g}-{i}".encode()).hexdigest()[:16]
            for i in range(g + 1)
        ]
        want[f"g{g}"] = _ref_average(hashes)
        rows += [(f"g{g}", h) for h in hashes]
    df = spark.createDataFrame(rows, "gid string, h string")
    got = {r.gid: r.h for r in MM.majority_hash(df, "gid", "h").collect()}
    assert got == want


def test_frames_at_seconds_skips_past_end(spark):
    media = MM.synth_media(spark, 12, seed=7)
    nf = {r.media_id: r.n_frames for r in media.collect()}
    frames = MM.frames_at_seconds(media, seconds=(1, 3, 5, 10))
    got = {}
    for r in frames.collect():
        got.setdefault(r.media_id, []).append(r.second)
    for mid, secs in got.items():
        assert all(s < nf[mid] for s in secs)
        assert secs == sorted(secs)
    # media with n_frames <= 1 contribute no frames at all
    for mid, n in nf.items():
        if n <= 1:
            assert mid not in got


@pytest.fixture()
def creatives(spark):
    media = MM.synth_media(spark, 20, seed=3)
    exts = F.when(F.col("n_frames") % 3 == 0, "mp4").when(
        F.col("n_frames") % 3 == 1, "jpg"
    ).otherwise("gif")
    return media.select(
        F.col("media_id").alias("md5_hash"),
        exts.alias("file_extension"),
        "content", "n_frames",
    )


def test_creative_phashes_ladder(spark, creatives):
    out = {r.md5_hash: r.phash
           for r in MM.creative_phashes(creatives).collect()}
    rows = creatives.collect()
    assert set(out) == {r.md5_hash for r in rows}
    assert all(len(v) == 16 for v in out.values())
    # non-seekable rows equal the single-decode phash
    singles = {
        r.md5_hash: r.p
        for r in creatives.withColumn("p", MM.phash(F.col("content"))).collect()
    }
    for r in rows:
        if r.file_extension == "jpg":
            assert out[r.md5_hash] == singles[r.md5_hash]
        elif r.n_frames <= 1:
            # seekable but every seek fails -> single-decode fallback
            assert out[r.md5_hash] == singles[r.md5_hash]


def test_creative_phashes_cache_wins(spark, creatives):
    cached = creatives.limit(5).select(
        "md5_hash", F.lit("feedfacefeedface").alias("phash")
    )
    out = {r.md5_hash: r.phash
           for r in MM.creative_phashes(creatives, cached).collect()}
    for r in cached.collect():
        assert out[r.md5_hash] == "feedfacefeedface"


def test_creative_phashes_deterministic(spark, creatives):
    a = {r.md5_hash: r.phash for r in MM.creative_phashes(creatives).collect()}
    b = {r.md5_hash: r.phash for r in MM.creative_phashes(creatives).collect()}
    assert a == b
