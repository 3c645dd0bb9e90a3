#!/usr/bin/env python3
"""spark-submit entrypoint for the crawl frontier (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Local sandbox:
    python scripts/run_crawl.py --seeds 30000 --hosts 8000 --rounds 3

Cluster shape (the intended deployment):
    cd /root/repo && zip -r /tmp/sps.zip scrapy_processors_spark
    spark-submit --master <cluster> --py-files /tmp/sps.zip \
        scripts/run_crawl.py --seeds ... --checkpoint hdfs://.../ckpt

Prints one JSON line of run metrics (rounds, urls, throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10000)
    ap.add_argument("--hosts", type=int, default=2000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--degree", type=int, default=6)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-bloom", dest="bloom", action="store_false")  # bloom on by default
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from scrapy_processors_spark.session import get_spark
    from scrapy_processors_spark.frontier import graph
    from scrapy_processors_spark.frontier.crawler import CrawlConfig, run_crawl

    spark = get_spark(master=args.master, app_name="crawl-frontier")
    cfg = CrawlConfig(
        n_hosts=args.hosts, max_degree=args.degree, max_rounds=args.rounds,
        n_buckets=args.buckets, use_bloom=args.bloom,
        checkpoint_root=args.checkpoint,
    )
    seeds = graph.seed_urls(spark, args.seeds, cfg.n_hosts)
    t0 = time.time()
    state = run_crawl(spark, cfg, seeds=seeds, resume=args.resume)
    n_seen = state["seen"].count()
    n_fetched = state["fetch_log"].count()
    wall = time.time() - t0
    print(json.dumps({
        "rounds": state["round"],
        "urls_seen": n_seen,
        "urls_fetched": n_fetched,
        "wall_s": round(wall, 3),
        "urls_per_sec": round(n_seen / wall, 1),
        "round_metrics": cfg.metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
