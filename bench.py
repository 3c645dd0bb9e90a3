#!/usr/bin/env python3
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], plus frontier throughput at two parallelism levels
(local[8] vs local[N] — the sandbox substitute for N vs 4N executors,
BASELINE.md §3).  Prints ONE JSON line.

Queries are forced with the noop sink (full computation, no driver
collect, no output IO).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "clean_string", "normalize_whitespace", "extract_digits", "price_parser",
    "normalize_numeric", "datetime", "emails", "take_first_truthy",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "ngram_jaccard",
    "embedding_dedup", "ann_topk", "lang_id", "token_count", "quality_score",
    "fingerprint", "url_canonicalize", "url_seen_antijoin", "frontier_priority",
]

CRAWL = dict(n_seeds=100000, n_hosts=20000, max_degree=8, max_rounds=3, n_buckets=64)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def make_spark(cores: int):
    from scrapy_processors_spark.session import get_spark

    return get_spark(master=f"local[{cores}]", app_name=f"bench-{cores}",
                     shuffle_partitions=cores)


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        _force(df)
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_crawl_bench(spark, cores: int) -> dict:
    """Crawl BFS rounds + the field-processing pipeline over every fetched
    page (synthetic html -> RemoveHTMLTags kernel + clean_string + textstats),
    i.e. the full north-star shape: frontier scheduling + extraction."""
    from pyspark.sql import functions as F

    from scrapy_processors_spark import RemoveHTMLTags, clean_string
    from scrapy_processors_spark.datapipe import textstats
    from scrapy_processors_spark.frontier import graph
    from scrapy_processors_spark.frontier.crawler import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        n_hosts=CRAWL["n_hosts"], max_degree=CRAWL["max_degree"],
        max_rounds=CRAWL["max_rounds"], n_buckets=CRAWL["n_buckets"],
    )
    seeds = graph.seed_urls(spark, CRAWL["n_seeds"], cfg.n_hosts)
    # warm the JVM/codegen/python-worker paths so steady-state dominates
    run_crawl(spark, CrawlConfig(n_hosts=100, max_degree=2, max_rounds=1, n_buckets=4))
    warm = spark.range(256).select(F.concat(F.lit("<p>w "), F.col("id").cast("string"),
                                            F.lit("</p>")).alias("html"))
    _force(warm.select(clean_string.apply_scalar(RemoveHTMLTags()(F.col("html"))).alias("t")))

    t0 = time.time()
    state = run_crawl(spark, cfg, seeds=seeds)
    n_seen = state["seen"].count()
    n_fetched = state["fetch_log"].count()
    crawl_wall = time.time() - t0

    # extraction over fetched pages (deterministic synthetic html per url)
    t1 = time.time()
    words = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64("url", i), F.lit(1000)).cast("string")),
    ))
    pages = state["fetch_log"].select(
        "url", F.concat(F.lit('  "<p>'), words, F.lit(' !</p>  ')).alias("html"))
    processed = pages.select(
        "url",
        clean_string.apply_scalar(RemoveHTMLTags()(F.col("html"))).alias("text"),
        textstats.token_count_ws(F.col("html")).alias("n_tokens"),
        textstats.fingerprint(F.col("html")).alias("fp"),
        textstats.quality_score(F.col("html")).alias("quality"),
    )
    _force(processed)
    extract_wall = time.time() - t1

    wall = time.time() - t0
    return {
        "cores": cores,
        "urls_seen": n_seen,
        "urls_fetched": n_fetched,
        "crawl_wall_s": round(crawl_wall, 3),
        "extract_wall_s": round(extract_wall, 3),
        "wall_s": round(wall, 3),
        "urls_per_sec": round(n_seen / wall, 1),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    total_t0 = time.time()

    spark = make_spark(cpus)
    timings = run_queries(spark, sf_dir)
    crawl_hi = run_crawl_bench(spark, cpus)
    spark.stop()

    lo_cores = max(2, cpus // 4)
    spark_lo = make_spark(lo_cores)
    crawl_lo = run_crawl_bench(spark_lo, lo_cores)
    spark_lo.stop()

    ratio = crawl_hi["urls_per_sec"] / max(crawl_lo["urls_per_sec"], 1e-9)
    efficiency = round(ratio / (cpus / lo_cores), 3)

    out = {
        "metric": "headline query suite wall time (noop-forced) + frontier URLs/sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "frontier": {
            "config": CRAWL,
            "low": crawl_lo,
            "high": crawl_hi,
            "speedup": round(ratio, 3),
            "core_ratio": cpus / lo_cores,
            "scaling_efficiency": efficiency,
        },
        "total_wall_s": round(time.time() - total_t0, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
