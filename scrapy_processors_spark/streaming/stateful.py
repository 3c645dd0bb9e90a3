"""Custom stateful streaming operator: streaming URL-seen deduplication.

``applyInPandasWithState`` keyed by host-bucket keeps a compact per-bucket
seen-set (the streaming twin of the batch frontier's Bloom+anti-join): each
micro-batch emits only first-seen URLs, and the state store persists the
per-bucket hash set across batches and restarts (checkpointLocation).

State is a packed uint64 numpy buffer (8 bytes/url) — at 10^10 URLs the
batch frontier's Bloom segments are the right structure; this operator is
for bounded streaming windows (e.g. recent-URL suppression) where exactness
per bucket matters.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("url_hash", T.LongType()),
])

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BinaryType())])


def _dedup_fn(key: Tuple[int], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterable[pd.DataFrame]:
    # State blob = SORTED uint64 array (sortedness is re-established on every
    # update, so blobs written by older unsorted versions still load fine).
    # Membership and merge are vectorized numpy (searchsorted-based np.isin +
    # union1d) — the earlier per-row python set loop was ~20x slower at
    # bench scale and is semantically identical (first occurrence wins).
    if state.exists:
        (blob,) = state.get
        seen = np.sort(np.frombuffer(blob, dtype=np.uint64)) if blob \
            else np.empty(0, dtype=np.uint64)
    else:
        seen = np.empty(0, dtype=np.uint64)

    for pdf in pdfs:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64).astype(np.uint64)
        first_in_batch = ~pd.Series(hashes).duplicated().to_numpy()
        in_state = (np.isin(hashes, seen) if seen.size
                    else np.zeros(len(hashes), dtype=bool))
        fresh = first_in_batch & ~in_state
        if fresh.any():
            yield pdf.iloc[np.flatnonzero(fresh)][["bucket", "url", "url_hash"]]
            seen = np.union1d(seen, hashes[fresh])

    state.update((seen.tobytes(),))


def dedup_urls_stream(urls: DataFrame, n_buckets: int = 64) -> DataFrame:
    """urls(url string, ...) stream -> first-seen urls only (across batches)."""
    keyed = urls.select(
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "url",
        F.xxhash64("url").alias("url_hash"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# State-store provider classes (public Spark names).  HDFSBacked (the
# default) keeps every bucket's full state in executor memory between
# micro-batches — fine for the bounded-window scope documented above, but
# the retention cost is O(total state) in RAM.  RocksDB spills state to
# local disk with an in-memory working set, the right provider when
# per-bucket seen-sets outgrow executor memory.  The provider is pinned by
# the checkpoint at FIRST query start: Spark refuses to reload a
# checkpoint under a different provider, so choose before going live.
STATE_STORE_PROVIDERS = {
    "hdfs": ("org.apache.spark.sql.execution.streaming."
             "state.HDFSBackedStateStoreProvider"),
    "rocksdb": ("org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider"),
}


def dedup_urls_stream_to_parquet(urls: DataFrame, out_dir: str,
                                 checkpoint_dir: str, n_buckets: int = 64,
                                 state_store: str = None):
    """Run the stateful dedup with a RESTARTABLE sink.

    The ``memory``/``console`` sinks refuse checkpoint recovery
    ("This query does not support recovering from checkpoint location"), so
    cross-run state restore requires a fault-tolerant sink: ``foreachBatch``
    appending parquet is the production shape (idempotence per epoch is the
    caller's concern; availableNow + clean termination gives exactly-once
    here).  Returns the started StreamingQuery.

    ``state_store``: ``"hdfs"`` | ``"rocksdb"`` | a provider class name |
    None (leave the session conf untouched).  Set session-wide because the
    provider is a SQLConf read at query start, not a writeStream option."""
    if state_store is not None:
        urls.sparkSession.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS.get(state_store, state_store))
    deduped = dedup_urls_stream(urls, n_buckets)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
