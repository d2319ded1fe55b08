"""Structured Streaming fresh-link ingest: micro-batch drain, at-least-once
replay absorbed by the seen set, checkpointed restart (ST1-ST5)."""

import os

import pytest
from pyspark.sql import functions as F

from news_crawler_spark import streaming, synth
from news_crawler_spark.engine import CrawlEngine


@pytest.fixture()
def engine(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "wd"))
    eng.ingest(synth.build_seed_list(spark, 200))
    return eng


def _write_batch(spark, directory, lo, hi, name):
    df = synth.build_seed_list(spark, hi).filter(F.col("discovery_time") >= F.lit(
        synth.seed_row(lo)["discovery_time"]))
    df.coalesce(1).write.mode("append").parquet(directory)
    _ = name


def test_streaming_ingest_dedups_and_checkpoints(spark, engine, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    before = engine.catalog.read("pending", engine.catalog.latest_round()).count()

    # batch 1: seeds [200, 260) — new urls + some dup rediscoveries
    _write_batch(spark, src, 200, 260, "b1")
    streaming.drain_available(engine, src, ckpt)
    r1 = engine.catalog.latest_round()
    after1 = engine.catalog.read("pending", r1).count()
    assert after1 > before  # some new URLs admitted

    # batch 2 = replay of batch 1 (at-least-once) + fresh [260, 300)
    _write_batch(spark, src, 200, 300, "b2")
    streaming.drain_available(engine, src, ckpt)
    r2 = engine.catalog.latest_round()
    assert r2 > r1
    pend = engine.catalog.read("pending", r2)
    # no canonical URL appears twice despite the replay
    n = pend.count()
    assert pend.select("canonical_url").distinct().count() == n

    # the streaming checkpoint must not re-deliver already-read files
    streaming.drain_available(engine, src, ckpt)
    assert engine.catalog.latest_round() == r2  # isEmpty batch → no round

    # final frontier equals a pure-batch run over the same 300 seeds
    eng2 = CrawlEngine(spark, str(tmp_path / "wd2"))
    eng2.ingest(synth.build_seed_list(spark, 300))
    want = {r.canonical_url for r in
            eng2.catalog.read("pending", 0).select("canonical_url").collect()}
    got = {r.canonical_url for r in pend.select("canonical_url").collect()}
    assert got == want


def test_cursor_cut_stream_stateful(spark, tmp_path):
    """applyInPandasWithState cursor: batch 2 re-delivers batch 1's links
    plus fresh ones; only the fresh ones come out, state survives the
    micro-batch boundary via the checkpoint."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)

    synth.build_seed_list(spark, 60).coalesce(1).write.mode("append").parquet(src)
    stream = streaming.cursor_cut_stream(streaming.read_seed_stream(spark, src))
    q = (stream.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination()
    first = spark.read.parquet(out_dir).count()
    assert first > 0

    # batch 2: everything from batch 1 again (re-delivery) + nothing new
    synth.build_seed_list(spark, 60).coalesce(1).write.mode("append").parquet(src)
    q = (streaming.cursor_cut_stream(streaming.read_seed_stream(spark, src))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination()
    after_replay = spark.read.parquet(out_dir).count()
    # per-source cursor drops every re-delivered link
    assert after_replay == first

    # batch 3: genuinely fresh discoveries → emitted
    extra = synth.build_seed_list(spark, 90).filter(
        F.col("discovery_time") > F.lit(synth.seed_row(59)["discovery_time"]))
    extra.coalesce(1).write.mode("append").parquet(src)
    q = (streaming.cursor_cut_stream(streaming.read_seed_stream(spark, src))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() > after_replay


def test_discovery_rates_watermark(spark, tmp_path):
    """Watermarked windowed agg (1-min windows, 2-min watermark): late
    rows inside the watermark are counted, later-than-watermark rows are
    dropped from the aggregate, finalized windows are emitted exactly
    once (append mode)."""
    import os
    import time as _time
    from datetime import datetime

    from news_crawler_spark import streaming

    src = tmp_path / "rates_src"
    src.mkdir()

    def write_batch(name, rows, mtime):
        df = spark.createDataFrame(
            [("s1", f"https://h/{i}", ts, ts) for i, ts in enumerate(rows)],
            "source string, url string, published_ts timestamp, discovery_time timestamp",
        )
        p = str(src / name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        os.utime(p, (mtime, mtime))  # file-source processes in mtime order
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    out = str(tmp_path / "rates_out")
    ckpt = str(tmp_path / "rates_ckpt")

    def drain():
        # one availableNow run per deposited file ⇒ hard batch boundaries;
        # the watermark persists in the checkpoint across runs
        stream = spark.readStream.schema(
            "source string, url string, published_ts timestamp, discovery_time timestamp"
        ).parquet(str(src) + "/*")
        q = streaming.start_rate_monitor(
            stream, out, ckpt, window_duration="1 minute", watermark="2 minutes"
        )
        q.awaitTermination()

    t0 = _time.time()
    # batch 1: two rows in window 10:00, one at 10:05 → watermark → 10:03
    write_batch("b1", [datetime(2024, 6, 1, 10, 0, 10),
                       datetime(2024, 6, 1, 10, 0, 40),
                       datetime(2024, 6, 1, 10, 5, 0)], t0)
    drain()
    # batch 2: 10:00:50's window END (10:01) is behind the watermark
    # (10:03) → dropped from the aggregate; 10:03:30's window end
    # (10:04) outruns it → counted. (Spark's late filter gates on the
    # WINDOW's end, not the row's raw event time — a row in a
    # still-open window is counted even when the row itself is older
    # than the watermark; established against the boundary window in
    # the s4 gate query, analytics.s4_windowed_rates.)
    write_batch("b2", [datetime(2024, 6, 1, 10, 0, 50),
                       datetime(2024, 6, 1, 10, 3, 30)], t0 + 10)
    drain()
    # batch 3: advance watermark far enough to finalize everything ≤10:08
    write_batch("b3", [datetime(2024, 6, 1, 10, 10, 0)], t0 + 20)
    drain()
    got = {
        (r.window_start.strftime("%H:%M"), r.n_links)
        for r in spark.read.parquet(out).collect()
    }
    assert ("10:00", 2) in got          # late 10:00:50 was NOT added
    assert ("10:03", 1) in got          # in-watermark late row counted
    assert ("10:05", 1) in got
    assert not any(w == "10:10" for w, _ in got)  # never finalized
