"""Stateful streaming dedup: state persists across micro-batch runs via the
stream checkpoint (restart-resume), duplicates suppressed across batches."""

import pytest

from pyspark.sql import functions as F

from scrapy_processors_spark.streaming.stateful import dedup_urls_stream


def _run_once(spark, src, ckpt, name):
    stream = spark.readStream.schema("url string").parquet(src)
    q = (dedup_urls_stream(stream).writeStream.format("memory").queryName(name)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select url from {name}")


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(f"https://h{i % 5}.ex.com/p/{i}",) for i in range(20)], "url string")
    batch1.coalesce(1).write.mode("append").parquet(src)
    out1 = _run_once(spark, src, ckpt, "dedup1")
    assert out1.count() == 20

    # second run: 10 repeats of batch1 urls + 5 fresh urls land in new files;
    # the state store (restored from the checkpoint) suppresses the repeats
    batch2 = spark.createDataFrame(
        [(f"https://h{i % 5}.ex.com/p/{i}",) for i in range(10)]
        + [(f"https://h9.ex.com/new/{i}",) for i in range(5)], "url string")
    batch2.coalesce(1).write.mode("append").parquet(src)
    out2 = _run_once(spark, src, ckpt, "dedup2")
    urls2 = {r["url"] for r in out2.collect()}
    assert len(urls2) == 5
    assert all("/new/" in u for u in urls2)
