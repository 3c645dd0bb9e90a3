"""Deterministic synthetic crawl graph (seeded; no external data).

The web is a pure function of the URL: outlinks are derived from xxhash64 of
(url, child-index), so any executor computes identical children without
state.  Host distribution is log-uniform over host ids (Zipf-like skew: host
0 receives orders of magnitude more links than the tail — exercises the
hot-domain salting path).  ~30% of generated links carry aliasing noise
(fragment, trailing slash, mixed-case scheme/host, :80 port) to exercise
canonicalization (FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _u01(col: Column) -> Column:
    """Deterministic uniform [0,1) from a hash column."""
    return (F.pmod(col, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def child_host(url: Column, i: Column, n_hosts: int) -> Column:
    """Log-uniform host id -> heavy skew toward low ids."""
    u = _u01(F.xxhash64(url, i, F.lit("host")))
    hid = F.floor(F.exp(u * float(__import__("math").log(n_hosts)))) - 1
    return F.concat(F.lit("host"), hid.cast("string"), F.lit(".example.com"))


def outlinks(url: Column, max_degree: int = 8, n_hosts: int = 1000) -> Column:
    """array<string> of raw (pre-canonicalization) child URLs."""
    deg_u = _u01(F.xxhash64(url, F.lit("degree")))
    deg = (F.floor(deg_u * deg_u * max_degree) + 1).cast("int")

    def mk(i: Column) -> Column:
        h = F.xxhash64(url, i, F.lit("path"))
        host = child_host(url, i, n_hosts)
        path = F.concat(F.lit("/p/"), F.abs(h).cast("string"))
        noise = F.pmod(F.xxhash64(url, i, F.lit("noise")), F.lit(10))
        base = F.concat(F.lit("https://"), host, path)
        return (
            F.when(noise == 0, F.concat(base, F.lit("/")))            # trailing slash
            .when(noise == 1, F.concat(base, F.lit("#frag")))          # fragment
            .when(noise == 2, F.concat(F.lit("HTTPS://"), F.upper(host), path))
            .when(noise == 3, F.concat(F.lit("https://"), host, F.lit(":443"), path))
            .otherwise(base)
        )

    return F.transform(F.sequence(F.lit(1), deg), mk)


def seed_urls(spark: SparkSession, n_seeds: int = 100, n_hosts: int = 1000) -> DataFrame:
    """Deterministic seed list (FIXTURES.md §5 `seeds` shape)."""
    df = spark.range(n_seeds).select(
        F.concat(
            F.lit("https://host"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("seedhost")), F.lit(n_hosts)).cast("string"),
            F.lit(".example.com/seed/"), F.col("id").cast("string"),
        ).alias("url"),
        (_u01(F.xxhash64(F.col("id"), F.lit("prio"))) ).alias("priority_hint"),
    )
    return df


def robots_table(spark: SparkSession, n_hosts: int = 1000) -> DataFrame:
    """Synthetic robots: every 7th host disallows the /p/1* prefix."""
    hosts = spark.range(n_hosts).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")).alias("host"),
        F.when(F.col("id") % 7 == 0, F.array(F.lit("/p/1")))
        .otherwise(F.array().cast("array<string>")).alias("disallow_prefixes"),
    )
    return hosts


def politeness_table(spark: SparkSession, n_hosts: int = 1000,
                     base_tokens: int = 2, burst: int = 8) -> DataFrame:
    """Per-host token-bucket parameters (deterministic)."""
    return spark.range(n_hosts).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")).alias("host"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("rate")), F.lit(3)) + base_tokens)
        .cast("double").alias("tokens_per_round"),
        F.lit(burst).cast("double").alias("burst"),
    )
