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

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _u01(col: Column) -> Column:
    """Deterministic uniform [0,1) from a hash column."""
    return (F.pmod(col, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def child_host(url: Column, i: Column, n_hosts: int) -> Column:
    """Log-uniform host id -> heavy skew toward low ids."""
    u = _u01(F.xxhash64(url, i, F.lit("host")))
    hid = F.floor(F.exp(u * float(__import__("math").log(n_hosts)))) - 1
    return F.concat(F.lit("host"), hid.cast("string"), F.lit(".example.com"))


def outlinks(url: Column, max_degree: int = 8, n_hosts: int = 1000) -> Column:
    """array<string> of raw (pre-canonicalization) child URLs.

    Formulated as ``slice(array(mk(1)..mk(max_degree)), 1, deg)`` — value-
    identical to the previous ``transform(sequence(1, deg), mk)`` but with
    literal child indexes, so the whole tree stays inside whole-stage
    codegen.  Higher-order array lambdas are CodegenFallback (interpreted),
    and the interpreted eval path anti-scales under concurrency: the round-4
    ablation measured the sibling 800-element transform at 16.5 s on one
    task slot but 65 s TOTAL on four (lock contention in the interpreted
    path starves every other stage of the job, BENCH.md §7).  The eager
    per-degree evaluation costs ``max_degree - deg`` wasted flat expressions
    per row — codegen'd, orders of magnitude cheaper than interpretation."""
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

    all_children = F.array(*[mk(F.lit(i).cast("int"))
                             for i in range(1, max_degree + 1)])
    return F.slice(all_children, 1, deg)


def page_html_kernel(words_per_page: int = 800, vocab: int = 1000):
    """Factory: Arrow kernel generating the deterministic synthetic page
    body for a url — ``'  "<p>w## w## ... !</p>  '`` with uniform
    pseudo-random word ids (murmur3-finalizer mix of crc32(url) and the
    word index, vectorized in numpy).

    This replaces the bench's 800-element ``transform(sequence(...))``
    expression: higher-order lambdas are CodegenFallback, and the round-4
    ablation measured that interpreted tree at 16.5 s on ONE task slot but
    65 s total on four — interpreted-eval lock contention that also starved
    every python worker sharing the machine (BENCH.md §7).  The kernel is
    ~2x faster single-threaded and scales with task slots.  Same
    statistical shape as the old expression: ~``vocab`` distinct words,
    independent-ish draws per position (so shingle diversity for the
    minhash stage is preserved)."""
    word_list = np.array([f"w{i}" for i in range(vocab)])

    @F.pandas_udf(T.StringType())
    def kern(urls: "pd.Series") -> "pd.Series":
        idx = np.arange(1, words_per_page + 1, dtype=np.uint64)
        mixer = idx * np.uint64(0x9E3779B97F4A7C15)

        def one(u: str) -> str:
            x = np.uint64(zlib.crc32(u.encode("utf-8"))) ^ mixer
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            words = word_list[(x % np.uint64(vocab)).astype(np.int64)]
            return '  "<p>' + " ".join(words) + ' !</p>  '

        # na_action keeps the None -> None convention of the other Arrow
        # kernels (ADVICE r04: a null url must not abort the stage)
        return urls.map(one, na_action="ignore")

    return kern


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
