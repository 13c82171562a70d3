"""Structured Streaming parity: availableNow drain over the events
parquet equals the batch aggregation; commits land atomically via the
snapshot catalog."""

import shutil

from adscrawler_spark.sources.catalog import Catalog
from adscrawler_spark.streaming import structured

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events_dir = str(tmp_path / "events")
    import os
    os.makedirs(events_dir)
    shutil.copy(SF_DIR + "/events.parquet", events_dir)
    agg = structured.windowed_event_counts_stream(spark, events_dir, SCHEMA)
    structured.run_available_now(agg, out, ckpt)
    got = Catalog(out).table("event_windows").read(spark)
    want = structured.batch_equivalent(spark, SF_DIR + "/events.parquet", SCHEMA)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    shutil.rmtree(out, ignore_errors=True)
