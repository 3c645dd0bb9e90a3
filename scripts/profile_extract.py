#!/usr/bin/env python3
"""Diagnose the 4-slot extract-scaling collapse at ~43k pages (VERDICT r03 #1b).

Modes:
  sustain             — NO Spark: mp.Pool(4) raw-CPU burns back-to-back for
                        ~N seconds, printing delivered-cores per 25 s window.
                        Tests the "host throttles SUSTAINED multi-core load"
                        hypothesis directly (burst probes pass, long runs
                        starve).
  extract             — one Spark run: local[cores], n_pages synthetic pages,
                        stage-selected extract pipeline, timed after warmup.

Usage:
  python scripts/profile_extract.py sustain [seconds]
  python scripts/profile_extract.py extract <cores> <n_pages> <stage>
      stage in: full | no_minhash | no_sigs | htmlgen
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mode_sustain(total_s: float) -> None:
    import multiprocessing as mp

    from bench import _burn

    # calibrate single-core once (~2 s)
    n_iters = 30_000_000
    t0 = time.time(); _burn(n_iters); single = time.time() - t0
    windows = []
    start = time.time()
    with mp.Pool(4) as pool:
        while time.time() - start < total_s:
            t0 = time.time()
            pool.map(_burn, [n_iters] * 4)
            dt = time.time() - t0
            windows.append({
                "t_s": round(time.time() - start, 1),
                "window_s": round(dt, 2),
                "effective_cores_4": round(4 * single / dt, 2),
            })
    print(json.dumps({"mode": "sustain", "single_s": round(single, 2),
                      "windows": windows}))


def stage_pipeline(pages, cores: int, stage: str):
    from pyspark.sql import functions as F

    from bench import EXTRACT
    from scrapy_processors_spark import RemoveHTMLTags, clean_string
    from scrapy_processors_spark.datapipe import dedup, textstats
    from scrapy_processors_spark.frontier import graph

    html = graph.page_html_kernel(EXTRACT["words_per_page"])
    pages = pages.repartition(cores).select(
        "url", html(F.col("url")).alias("html"))
    if stage == "htmlgen":
        return pages.select("url", F.length("html").alias("n"))
    text = clean_string.apply_scalar(RemoveHTMLTags()(F.col("html")))
    pages = pages.select("url", text.alias("text"), "html")
    cols = [
        "url", "text",
        textstats.token_count_ws(F.col("html")).alias("n_tokens"),
        F.xxhash64(F.col("html")).alias("fp"),
        textstats.quality_score(F.col("html")).alias("quality"),
        textstats.lang_id(F.col("text")).alias("lang_guess"),
    ]
    if stage in ("full", "no_minhash"):
        cols.append(dedup.simhash16_kernel(F.col("text")).alias("simhash"))
    if stage == "full":
        mh = dedup.minhash_lanes_kernel(num_hashes=4, shingle_n=2)
        cols.append(mh(F.col("text")).alias("minhash"))
    return pages.select(*cols)


def mode_extract(cores: int, n_pages: int, stage: str) -> None:
    from bench import cpu_calibration

    from scrapy_processors_spark.session import get_spark

    calib0 = cpu_calibration(1, 4)
    s = get_spark(master=f"local[{cores}]", app_name=f"profile-{cores}",
                  shuffle_partitions=cores,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})
    from pyspark.sql import functions as F

    def base(n):
        return s.range(n).select(
            F.concat(F.lit("http://m"), F.pmod(F.col("id"), F.lit(97)).cast("string"),
                     F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"))

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup at the real shape, small count (twice)
    force(stage_pipeline(base(512), cores, stage))
    force(stage_pipeline(base(1500), cores, stage))
    t0 = time.time()
    force(stage_pipeline(base(n_pages), cores, stage))
    wall = time.time() - t0
    calib1 = cpu_calibration(1, 4)
    s.stop()
    print(json.dumps({
        "mode": "extract", "cores": cores, "n_pages": n_pages, "stage": stage,
        "wall_s": round(wall, 2),
        "pages_per_sec": round(n_pages / wall, 1),
        "calib_before": calib0, "calib_after": calib1,
    }))


if __name__ == "__main__":
    if sys.argv[1] == "sustain":
        mode_sustain(float(sys.argv[2]) if len(sys.argv) > 2 else 240.0)
    else:
        mode_extract(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
