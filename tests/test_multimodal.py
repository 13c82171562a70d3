"""Multimodal plumbing: schema round-trip, decode/feature/resize/
frame-sample batch shapes, determinism, and the explicit real-codec
NotImplementedError gate."""

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, tmp_path_factory):
    df = mm.synth_media(spark, 200)
    # round-trip through partitioned parquet (binary column survives)
    path = str(tmp_path_factory.mktemp("media"))
    df.write.partitionBy("kind").mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_schema_and_partitioning(media):
    assert dict(media.dtypes)["content"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert media.count() == 200


def test_decode_matches_metadata(media):
    dec = mm.decode(media)
    joined = dec.join(media, "media_id")
    bad = joined.filter(
        (F.col("dec_width") != F.col("width"))
        | (F.col("dec_height") != F.col("height"))
        | (F.col("dec_sample_rate") != F.col("sample_rate"))
        | (F.col("dec_n_frames") != F.col("n_frames"))
    ).count()
    assert bad == 0
    assert dec.filter("payload_bytes != 128").count() == 0  # 8 x md5 = 128B


def test_features_and_phash_deterministic(media):
    f1 = {
        r.media_id: (tuple(r.feat), r.ph)
        for r in media.select(
            "media_id",
            mm.media_features("content").alias("feat"),
            mm.phash("content").alias("ph"),
        ).collect()
    }
    f2 = {
        r.media_id: (tuple(r.feat), r.ph)
        for r in media.select(
            "media_id",
            mm.media_features("content").alias("feat"),
            mm.phash("content").alias("ph"),
        ).collect()
    }
    assert f1 == f2
    feats = next(iter(f1.values()))[0]
    assert len(feats) == 8
    assert all(len(v[1]) == 16 for v in f1.values())


def test_resize_rewrites_header(media, spark):
    resized = media.select("media_id", mm.resize_image("content").alias("content"))
    dec = mm.decode(resized.withColumn("kind", F.lit("image")))
    rows = dec.collect()
    assert all(r.dec_width == 128 and r.dec_height == 128 for r in rows)
    assert all(r.payload_bytes == 64 for r in rows)


def test_frame_sampling_shape(media):
    frames = mm.sample_frames(media, every_n=5, fps=10)
    vids = {r.media_id: r.n_frames for r in media.filter("kind='video'").collect()}
    got = frames.groupBy("media_id").count().collect()
    assert {r.media_id for r in got} == set(vids)
    for r in got:
        expected = (vids[r.media_id] + 4) // 5
        assert r["count"] == expected, r.media_id
    ts = frames.filter("frame_idx = 5").select("ts_ms").first()
    assert ts.ts_ms == 500


def test_real_codec_gate(spark):
    df = spark.createDataFrame(
        [("x", "image", bytearray(b"\x89PNG real bytes"))],
        "media_id string, kind string, content binary",
    )
    with pytest.raises(Exception) as exc:
        mm.decode(df).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs unavailable" in str(
        exc.value
    )
