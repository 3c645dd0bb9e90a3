#!/usr/bin/env python3
"""10^7-shape frontier dry run (VERDICT r02 #9): one crawl round over ~10M
synthetic URLs at local[4], recording per-phase wall, shuffle bytes (Spark
REST API), and Bloom segment sizes — the measured base for BENCH.md's
10^10 extrapolation.

    python scripts/frontier_dryrun.py            # N=10_000_000
    N=1000000 python scripts/frontier_dryrun.py  # smaller shapes
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def shuffle_totals_local(spark) -> dict:
    """Sum shuffle/input bytes over all stages from the driver-local
    AppStatusStore (r06, VERDICT r05 #4): unlike the REST listing — whose
    single JSON serialization of ~90 stages timed out after the 1400 s r05
    crawl — this is an in-process KVStore scan with no HTTP payload, so it
    cannot time out.  Fields match the REST summary semantics (the REST
    handler reads the same store)."""
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),        # all statuses
        False, False,                     # no task data / details
        gw.new_array(jvm.double, 0),      # no quantiles
        jvm.java.util.ArrayList())
    n = stages.size()
    return {
        "n_stages": n,
        "shuffle_write_bytes": sum(
            stages.apply(i).shuffleWriteBytes() for i in range(n)),
        "shuffle_read_bytes": sum(
            stages.apply(i).shuffleReadBytes() for i in range(n)),
        "input_bytes": sum(stages.apply(i).inputBytes() for i in range(n)),
    }


def shuffle_totals(ui_port: int = 4040) -> dict:
    """Sum shuffle/input bytes over all completed stages via the REST API."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    # The stage listing can be slow to serialize on a long run (r05: the
    # 30s timeout fired after ~1400s of crawl left ~90 stages behind), so
    # ask for the summary-only payload and retry once with a longer wait.
    last_err = None
    for timeout in (30, 120):
        try:
            apps = json.load(urllib.request.urlopen(base, timeout=10))
            app_id = apps[0]["id"]
            stages = json.load(urllib.request.urlopen(
                f"{base}/{app_id}/stages?status=complete&details=false",
                timeout=timeout))
            break
        except Exception as e:  # noqa: BLE001
            last_err = e
    else:
        return {"error": str(last_err)}
    return {
        "n_stages": len(stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
    }


def main():
    n_seeds = int(os.environ.get("N", "10000000"))
    n_hosts = int(os.environ.get("H", "200000"))
    cores = int(os.environ.get("C", "4"))
    n_buckets = int(os.environ.get("B", "64"))

    from scrapy_processors_spark.session import get_spark
    from scrapy_processors_spark.frontier import graph
    from scrapy_processors_spark.frontier.crawler import CrawlConfig, run_crawl

    spark = get_spark(master=f"local[{cores}]", app_name="frontier-dryrun",
                      shuffle_partitions=max(cores * 8, n_buckets),
                      extra_conf={"spark.ui.enabled": "true"})
    cfg = CrawlConfig(n_hosts=n_hosts, max_degree=2, max_rounds=1,
                      n_buckets=n_buckets)

    t0 = time.time()
    seeds = graph.seed_urls(spark, n_seeds, n_hosts).repartition(cores * 8)
    state = run_crawl(spark, cfg, seeds=seeds)
    n_seen = state["seen"].count()
    n_fetched = state["fetch_log"].count()
    wall = time.time() - t0

    bloom_stats = None
    if state.get("bloom") is not None:
        import numpy as np

        # est. FPR of a k-hash filter at bit-load L is L^k — the residue
        # the exact anti-join backstop has to absorb (VERDICT r03 #9:
        # auto_m_bits must keep this bounded as seed volume grows).
        # 64 segments x <=2 MiB is a bounded diagnostic collect.
        rows = state["bloom"].select("m_bits", "k", "bitmap").collect()
        loads = [
            float(np.unpackbits(np.frombuffer(r["bitmap"], np.uint8)).sum())
            / (len(r["bitmap"]) * 8)
            for r in rows if r["bitmap"]
        ]
        if rows:
            k = max(r["k"] for r in rows)
            bloom_stats = {
                "segments": len(rows),
                "bitmap_bytes": sum(len(r["bitmap"] or b"") for r in rows),
                "m_bits": max(r["m_bits"] for r in rows),
                "k": k,
                "avg_bit_load": round(sum(loads) / max(len(loads), 1), 4),
                "max_bit_load": round(max(loads), 4) if loads else None,
                "est_fpr": round((sum(loads) / max(len(loads), 1)) ** k, 6),
            }
        else:  # bloom table present but empty (e.g. pre-seen checkpoint)
            bloom_stats = {"segments": 0}

    out = {
        "n_seeds": n_seeds,
        "n_hosts": n_hosts,
        "cores": cores,
        "n_buckets": n_buckets,
        "urls_seen": n_seen,
        "urls_fetched": n_fetched,
        "round_wall_s": round(wall, 1),
        "urls_per_sec": round(n_seen / wall, 1),
        "bloom": bloom_stats,
        "shuffle": shuffle_totals_local(spark),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
