"""Per-host-bucket Bloom segments for the URL-seen set.

The durable, exact seen-set is a parquet table keyed by ``url_hash``
(xxhash64 — 64-bit; a 32-bit murmur would saturate at the 10^10-URL target).
Bloom segments are the *fast path*: one bitmap per host-bucket, built and
probed with vectorized numpy inside ``applyInPandas`` / cogrouped
``applyInPandas``, so each task touches only its bucket's segment.  False
positives are resolved by the exact ``left_anti`` join backstop
(BASELINE.json north_rule: Bloom + exact seen set).

Bit indexing uses double hashing from the two 32-bit halves of the 64-bit
url hash — no RNG, reproducible everywhere.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("m_bits", T.LongType()),
    T.StructField("k", T.IntegerType()),
    T.StructField("bitmap", T.BinaryType()),
])


def auto_m_bits(expected_urls: int, n_buckets: int, bits_per_url: int = 10,
                floor: int = 1 << 20, ceiling: int = 1 << 24) -> int:
    """Per-bucket bitmap size from the expected URL volume.

    The 10^7-seed dry run (BENCH.md) measured 0.6 bit-load segments at the
    fixed 2^20 default — FPR degrades and the exact anti-join backstop ends
    up doing the work the filter should.  ~10 bits/element keeps a k=5
    filter near 1% FPR; the result is rounded up to a power of two and
    clamped to [2^20, 2^24] (the dry run's recommended ceiling: a 2^24
    bitmap is 2 MiB/bucket — 128 MiB across 64 buckets, well inside an
    executor, and beyond it the backstop anti-join is cheaper than the
    bitmap shuffle)."""
    per_bucket = max(1, int(expected_urls) // max(1, n_buckets))
    want = per_bucket * bits_per_url
    m = floor
    while m < want and m < ceiling:
        m <<= 1
    return m


def _indexes(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing of the 64-bit url hash."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    ks = np.arange(k, dtype=np.int64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % m_bits


def build_segments(seen: DataFrame, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """seen(bucket, url_hash, ...) -> one bitmap row per bucket."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        idx = _indexes(pdf["url_hash"].to_numpy(), m_bits, k)
        bits[idx.ravel()] = True
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "m_bits": [m_bits],
            "k": [k],
            "bitmap": [np.packbits(bits).tobytes()],
        })

    return seen.groupBy("bucket").applyInPandas(build, schema=BLOOM_SCHEMA)


def update_segments(segments: DataFrame, new_hashes: DataFrame,
                    m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """OR the round's NEW url hashes into the existing per-bucket segments —
    incremental maintenance, O(new URLs) per round instead of the O(total
    seen) full rebuild (VERDICT r01 'what's wrong' #3).  Buckets appearing
    for the first time get a fresh bitmap; buckets with no new rows pass
    through unchanged (cogroup emits keys from either side)."""

    def upd(key, seg: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        if len(seg):
            m, kk = int(seg["m_bits"].iloc[0]), int(seg["k"].iloc[0])
            bits = np.unpackbits(
                np.frombuffer(seg["bitmap"].iloc[0], dtype=np.uint8)).astype(bool)
        else:
            m, kk = m_bits, k
            bits = np.zeros(m, dtype=bool)
        if len(new):
            idx = _indexes(new["url_hash"].to_numpy(), m, kk)
            bits[idx.ravel()] = True
        return pd.DataFrame({
            "bucket": [int(key[0])],
            "m_bits": [m],
            "k": [kk],
            "bitmap": [np.packbits(bits).tobytes()],
        })

    return (
        segments.groupBy("bucket")
        .cogroup(new_hashes.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(upd, schema=BLOOM_SCHEMA)
    )


def filter_unseen(candidates: DataFrame, segments: DataFrame) -> DataFrame:
    """Cogrouped probe: keep candidate rows whose hash is definitely-unseen
    (bloom negative) OR possibly-seen — tagged so the caller can route only
    the possibly-seen residue through the exact anti-join.

    Output = candidates schema + ``maybe_seen`` boolean.
    """
    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def probe(key, cand_it: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        cand = cand_it
        if len(cand) == 0:
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(seg) == 0:
            return cand.assign(maybe_seen=False)
        bits = np.unpackbits(
            np.frombuffer(seg["bitmap"].iloc[0], dtype=np.uint8)
        ).astype(bool)
        m, k = int(seg["m_bits"].iloc[0]), int(seg["k"].iloc[0])
        idx = _indexes(cand["url_hash"].to_numpy(), m, k)
        maybe = bits[idx].all(axis=1)
        return cand.assign(maybe_seen=maybe)

    return (
        candidates.groupBy("bucket")
        .cogroup(segments.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )
