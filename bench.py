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

CRAWL = dict(n_seeds=50000, n_hosts=10000, max_degree=6, max_rounds=3, n_buckets=64)


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
        F.xxhash64(F.col("html")).alias("fp"),  # native 64-bit fingerprint (rolling-hash variant is the oracle-checked op)
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


def _burn(_):
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x


def cpu_calibration(lo: int, hi: int) -> dict:
    """Raw-CPU parallel efficiency of this machine at the two levels — the
    hardware ceiling any Spark job is bounded by.  The sandbox advertises 32
    CPUs but hypervisor overcommit delivers far fewer effective cores, so
    job scaling must be read against this ceiling (BASELINE.md §3)."""
    import multiprocessing as mp

    burn = _burn
    t0 = time.time(); burn(0); single = time.time() - t0
    out = {"single_s": round(single, 2)}
    for n in (lo, hi):
        t0 = time.time()
        with mp.Pool(n) as pool:
            pool.map(burn, range(n))
        dt = time.time() - t0
        out[f"eff_{n}"] = round((n * single / dt) / n, 3)
        out[f"effective_cores_{n}"] = round(n * single / dt, 1)
    out["hw_ceiling"] = round(
        out[f"effective_cores_{hi}"] / out[f"effective_cores_{lo}"] / (hi / lo), 3)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pair = os.environ.get("SPARK_GRAFT_BENCH_CORES", "2,8")
    lo_cores, hi_cores = (int(x) for x in pair.split(","))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    total_t0 = time.time()

    calib = cpu_calibration(lo_cores, hi_cores)

    spark = make_spark(min(cpus, 16))
    timings = run_queries(spark, sf_dir)
    spark.stop()

    # fresh JVM per crawl run so heap/cache state is identical at both levels
    spark_hi = make_spark(hi_cores)
    crawl_hi = run_crawl_bench(spark_hi, hi_cores)
    spark_hi.stop()

    spark_lo = make_spark(lo_cores)
    crawl_lo = run_crawl_bench(spark_lo, lo_cores)
    spark_lo.stop()

    ratio = crawl_hi["urls_per_sec"] / max(crawl_lo["urls_per_sec"], 1e-9)
    efficiency = round(ratio / (hi_cores / lo_cores), 3)

    out = {
        "metric": "headline query suite wall time (noop-forced) + frontier URLs/sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpu_calibration": calib,
        "frontier": {
            "config": CRAWL,
            "low": crawl_lo,
            "high": crawl_hi,
            "speedup": round(ratio, 3),
            "core_ratio": hi_cores / lo_cores,
            "scaling_efficiency": efficiency,
            "efficiency_vs_hw_ceiling": round(
                efficiency / max(calib["hw_ceiling"], 1e-9), 3),
        },
        "total_wall_s": round(time.time() - total_t0, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
