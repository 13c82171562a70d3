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


def test_stateful_sessionize_stream_parity(spark, tmp_path):
    """applyInPandasWithState gap sessionization equals a sequential
    pandas replay of the same gap rule, across micro-batch boundaries
    and event-time timeouts."""
    import os

    import pandas as pd

    events_dir = str(tmp_path / "events_files")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(events_dir)
    ev = (
        spark.read.parquet(SF_DIR + "/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # time-ordered thirds as separate files so the watermark advances
    # across micro-batches (maxFilesPerTrigger=1)
    k = len(ev) // 3
    parts = [ev.iloc[:k], ev.iloc[k : 2 * k], ev.iloc[2 * k :]]
    # two far-future sentinel files push the watermark past every real
    # session's (end + gap) so all real sessions flush via timeout
    far1 = ev.iloc[:1].copy()
    far1["user_id"] = -1
    far1["ts"] = ev["ts"].max() + pd.Timedelta(days=365)
    far2 = far1.copy()
    far2["ts"] = far1["ts"] + pd.Timedelta(days=1)
    for i, pdf in enumerate(parts + [far1, far2]):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{events_dir}/part{i}"
        )
    # file source orders by modification time; our loop wrote in order
    sessions = structured.sessionize_stream(
        spark, events_dir + "/part*", SCHEMA
    )
    rows = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in rows
        if r.user_id >= 0
    )
    # sequential oracle: per-user gap split (> 30 min starts a session)
    want = []
    gap = pd.Timedelta(minutes=30)
    for uid, grp in ev.groupby("user_id"):
        ts = grp["ts"].sort_values().tolist()
        s = e = ts[0]
        n = 1
        for t in ts[1:]:
            if t - e > gap:
                want.append((uid, str(s), str(e), n))
                s, e, n = t, t, 1
            else:
                e, n = t, n + 1
        want.append((uid, str(s), str(e), n))
    assert got == sorted(want) and len(got) > 0


def test_sessionize_stream_out_of_order_within_watermark(spark, tmp_path):
    """A late event that arrives in a LATER micro-batch but within the
    watermark must extend (here: bridge) an earlier session instead of
    producing a duplicate/split — sessions are held in state until the
    watermark passes end + gap, so arrival order must not matter."""
    import os

    import pandas as pd

    events_dir = str(tmp_path / "ooo_files")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(events_dir)
    t0 = pd.Timestamp("2026-08-02 10:00:00")

    def mk(ts_list):
        return pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "ts": ts_list,
                "user_id": [1] * len(ts_list),
                "event_type": ["e"] * len(ts_list),
                "value": [1.0] * len(ts_list),
                "props": ["{}"] * len(ts_list),
            }
        )

    m = pd.Timedelta(minutes=1)
    # batch 1: two clusters 40 min apart -> look like two sessions
    b1 = mk([t0, t0 + 5 * m, t0 + 45 * m])
    # batch 2: a LATE event at +25min bridges them into ONE session
    # (gap 30min: 25-5=20 <= 30 and 45-25=20 <= 30)
    b2 = mk([t0 + 25 * m])
    # sentinels push the watermark far past everything
    far1 = mk([t0 + pd.Timedelta(days=400)])
    far1["user_id"] = -1
    far2 = mk([t0 + pd.Timedelta(days=401)])
    far2["user_id"] = -1
    for i, pdf in enumerate([b1, b2, far1, far2]):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{events_dir}/part{i}"
        )
    # 2h watermark: the +25min event in batch 2 is late (watermark has
    # advanced past it) but still admissible
    sessions = structured.sessionize_stream(
        spark, events_dir + "/part*", SCHEMA, watermark="2 hours"
    )
    rows = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in rows
        if r.user_id >= 0
    ]
    assert got == [(1, str(t0), str(t0 + 45 * m), 4)]


def test_unseen_urls_stream_dedup_parity(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a discovered-URL stream: one
    output row per canonical URL (first sighting wins), equal to the
    batch distinct set; repeats across files/micro-batches inside the
    watermark are dropped."""
    import os

    import pandas as pd

    urls_dir = str(tmp_path / "urls")
    out = str(tmp_path / "seen_out")
    ckpt = str(tmp_path / "seen_ckpt")
    os.makedirs(urls_dir)
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for i in range(600):
        canon = f"https://host{(i % 150) % 7}.com/app{i % 150}"
        rows.append(
            (i, canon, base + pd.Timedelta(minutes=i % 50))
        )
    df = pd.DataFrame(rows, columns=["url_id", "url_canon", "discovered_at"])
    # Spark's vectorized parquet reader rejects pandas' default
    # nanosecond timestamps — write microseconds
    df["discovered_at"] = df["discovered_at"].astype("datetime64[us]")
    # two files → two micro-batches under availableNow; dupes span both
    df.iloc[:300].to_parquet(urls_dir + "/a.parquet", index=False)
    df.iloc[300:].to_parquet(urls_dir + "/b.parquet", index=False)

    schema = "url_id long, url_canon string, discovered_at timestamp"
    dedup = structured.unseen_urls_stream(spark, urls_dir, schema)
    structured.run_unseen_available_now(dedup, out, ckpt)
    got = Catalog(out).table("frontier_ingest").read(spark)
    got_canons = sorted(r.url_canon for r in got.collect())
    want_canons = sorted(df["url_canon"].unique())
    assert got_canons == want_canons  # one row per canonical URL
    assert len(got_canons) == 150


def test_unseen_sink_skips_replayed_batch(spark, tmp_path):
    """foreachBatch replay safety: Structured Streaming re-delivers the
    last micro-batch after a crash between sink commit and checkpoint
    advance.  The unseen sink records each batch_id in the snapshot
    meta and must skip a batch_id it has already committed — a replay
    lands exactly once instead of doubling rows in a table whose
    contract is one-row-per-url_canon."""
    import pandas as pd

    out = str(tmp_path / "seen_out")
    cat = Catalog(out)
    tbl = cat.table("frontier_ingest")
    pdf = pd.DataFrame({"url_canon": ["https://a.com/x", "https://b.com/y"]})
    df = spark.createDataFrame(pdf)

    # simulate the sink committing batches 0 and 1
    for bid in (0, 1):
        if bid <= structured._last_committed_stream_batch(tbl):
            continue
        tbl.append(df, {"stream_batch": bid})
    assert structured._last_committed_stream_batch(tbl) == 1

    # crash replay: batch 1 is delivered again → must be skipped
    replayed = 0
    for bid in (1, 2):
        if bid <= structured._last_committed_stream_batch(tbl):
            replayed += 1
            continue
        tbl.append(df, {"stream_batch": bid})
    assert replayed == 1
    got = tbl.read(spark)
    # 3 committed batches (0, 1, 2) × 2 rows — not 4 batches
    assert got.count() == 6
