"""Stateful streaming dedup: state persists across micro-batch runs via the
stream checkpoint (restart-resume), duplicates suppressed across batches.

The sink must be fault-tolerant for the restart to recover state — memory/
console sinks raise on checkpoint recovery, so the runs write parquet via
foreachBatch (stateful.dedup_urls_stream_to_parquet)."""

import pytest

from pyspark.sql import functions as F

from scrapy_processors_spark.streaming.stateful import dedup_urls_stream_to_parquet


def _run_once(spark, src, out, ckpt):
    stream = spark.readStream.schema("url string").parquet(src)
    q = dedup_urls_stream_to_parquet(stream, out, ckpt)
    q.awaitTermination(180)


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(f"https://h{i % 5}.ex.com/p/{i}",) for i in range(20)], "url string")
    batch1.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, out, ckpt)
    out1 = spark.read.parquet(out)
    assert out1.count() == 20

    # second run: 10 repeats of batch1 urls + 5 fresh urls land in new files;
    # the state store (restored from the checkpoint) suppresses the repeats
    batch2 = spark.createDataFrame(
        [(f"https://h{i % 5}.ex.com/p/{i}",) for i in range(10)]
        + [(f"https://h9.ex.com/new/{i}",) for i in range(5)], "url string")
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, out, ckpt)

    rows = spark.read.parquet(out).select("url").collect()
    urls = [r["url"] for r in rows]
    # 20 from run 1 + only the 5 fresh from run 2, no duplicates emitted
    assert len(urls) == 25
    assert len(set(urls)) == 25
    assert sum(1 for u in urls if "/new/" in u) == 5
