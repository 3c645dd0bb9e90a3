#!/usr/bin/env python3
"""Throughput of the stateful streaming URL-seen dedup (VERDICT r03 #10).

Generates a deterministic url stream into parquet (several files => several
micro-batches with ~30% cross-batch duplicates), then runs
``dedup_urls_stream`` with an availableNow trigger at a given parallelism
and reports rows/s end-to-end (state store + applyInPandasWithState).

Usage: python scripts/streaming_bench.py <cores> <n_urls> [n_files]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cores: int, n_urls: int, n_files: int = 8) -> None:
    from pyspark.sql import functions as F

    from scrapy_processors_spark.session import get_spark
    from scrapy_processors_spark.streaming import stateful

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src, ckpt, out = (os.path.join(work, d) for d in ("src", "ckpt", "out"))
    s = get_spark(master=f"local[{cores}]", app_name=f"stream-bench-{cores}",
                  shuffle_partitions=cores)
    try:
        # ~30% of urls repeat an earlier id => cross/in-batch duplicates
        urls = s.range(n_urls).select(
            F.when(F.col("id") % 10 < 3, (F.col("id") * 7) % (n_urls // 2))
            .otherwise(F.col("id")).alias("uid"))
        urls = urls.select(
            F.concat(F.lit("https://host"), (F.col("uid") % 997).cast("string"),
                     F.lit(".example.com/p/"), F.col("uid").cast("string")).alias("url"))
        urls.repartition(n_files).write.mode("overwrite").parquet(src)

        stream = (s.readStream.schema("url string").parquet(src)
                  .withColumn("url_hash", F.xxhash64("url")))
        deduped = stateful.dedup_urls_stream(stream, n_buckets=max(cores * 4, 8))
        t0 = time.time()
        q = (deduped.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
        n_out = s.read.parquet(out).count()
        print(json.dumps({
            "mode": "streaming_dedup", "cores": cores, "n_urls": n_urls,
            "n_files": n_files, "wall_s": round(wall, 2),
            "rows_per_sec": round(n_urls / wall, 1),
            "unique_out": n_out,
        }))
    finally:
        s.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)
