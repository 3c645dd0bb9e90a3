"""Per-host-bucket cuckoo-filter segments for the URL-seen set.

BASELINE.json's north_star names a "partitioned Bloom/cuckoo URL-seen set";
``bloom.py`` is the Bloom half, this module is the cuckoo half (selected via
``CrawlConfig.filter_kind``).  Design follows the public algorithm of Fan,
Andersen, Kaminsky & Mitzenmacher, "Cuckoo Filter: Practically Better Than
Bloom" (CoNEXT 2014): a table of ``m`` buckets x ``b=4`` slots of 16-bit
fingerprints with partial-key cuckoo hashing (``alt(i, fp) = i XOR
h(fp)``), which gives

* ~0.01% false-positive rate at 4x16-bit slots (vs ~1% for the Bloom
  sizing at equal memory), and
* **deletion** — impossible with plain Bloom — which a recrawl/expiry
  policy needs to retire URLs from the seen set.

Like the Bloom segments, one filter table per host-bucket, built and probed
with vectorized numpy inside (cogrouped) ``applyInPandas`` so each task
touches only its bucket's segment.  Bulk inserts are two vectorized
placement passes (items that fit their primary/alternate bucket without
eviction — the vast majority below ~0.9 load) plus a short sequential
eviction loop for the remainder; insertion overflow lands in a per-segment
stash so the filter NEVER has false negatives (an overflow-dropped
fingerprint would make a seen URL probe "definitely unseen" and re-enter
the frontier).  All hashing is arithmetic on the 64-bit url hash — no RNG,
reproducible everywhere; the deterministic round-robin eviction choice
keeps segment bytes identical across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("m_buckets", T.LongType()),
    T.StructField("slots", T.IntegerType()),
    T.StructField("table", T.BinaryType()),   # uint16[m_buckets * slots]
    T.StructField("stash", T.BinaryType()),   # int64[n] interleaved (idx, fp)
])

_FP_MIX = 0x5BD1E995  # MurmurHash2 multiplier (public constant) for alt-index


def _fp_i1_i2(hashes: np.ndarray, m: int):
    """fingerprint + primary/alternate bucket indexes (m is a power of 2)."""
    h = hashes.astype(np.uint64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)
    fp = np.where(fp == 0, 1, fp)  # 0 is the empty-slot sentinel
    i1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64) & (m - 1)
    i2 = _alt(i1, fp, m)
    return fp, i1, i2


def _alt(i: np.ndarray, fp: np.ndarray, m: int):
    """Partial-key alternate index: an involution, so eviction chains can
    bounce between the two candidate buckets knowing only (i, fp)."""
    return (i ^ (fp * _FP_MIX)) & (m - 1)


def _contains(table: np.ndarray, fp, i1, i2) -> np.ndarray:
    return ((table[i1] == fp[:, None]).any(axis=1)
            | (table[i2] == fp[:, None]).any(axis=1))


def _place_pass(table: np.ndarray, fp: np.ndarray, idx: np.ndarray,
                todo: np.ndarray) -> np.ndarray:
    """Vectorized placement of items ``todo`` into bucket rows ``idx``:
    the r-th item of a bucket-group takes the r-th free slot.  Returns the
    still-unplaced subset of ``todo``."""
    if todo.size == 0:
        return todo
    ii = idx[todo]
    order = np.argsort(ii, kind="stable")
    ii_s, items_s = ii[order], todo[order]
    # rank within each bucket-group
    grp_new = np.r_[True, ii_s[1:] != ii_s[:-1]]
    grp_id = np.cumsum(grp_new) - 1
    grp_start = np.flatnonzero(grp_new)
    ranks = np.arange(len(ii_s)) - grp_start[grp_id]
    free = table[ii_s] == 0                      # (n, b)
    free_rank = np.cumsum(free, axis=1) - 1      # per-row free-slot ordinal
    placed = np.zeros(len(ii_s), dtype=bool)
    for j in range(table.shape[1]):
        take = free[:, j] & (free_rank[:, j] == ranks) & ~placed
        table[ii_s[take], j] = fp[items_s[take]]
        placed |= take
    return items_s[~placed]


def _insert(table: np.ndarray, stash: list, fp: np.ndarray,
            i1: np.ndarray, i2: np.ndarray, m: int,
            max_kicks: int = 500) -> None:
    """Bulk insert (in place).  Items already present are skipped."""
    todo = np.flatnonzero(~_contains(table, fp, i1, i2))
    if todo.size == 0:
        return
    # batch-internal dedup: one representative per (i1, fp)
    keys = i1[todo] * np.int64(1 << 17) + fp[todo]
    todo = todo[np.unique(keys, return_index=True)[1]]
    todo = _place_pass(table, fp, i1, todo)      # primary-bucket pass
    todo = _place_pass(table, fp, i2, todo)      # alternate-bucket pass
    b = table.shape[1]
    for item in todo:                            # eviction loop (rare tail)
        f, i = int(fp[item]), int(i1[item])
        for kick in range(max_kicks):
            row = table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                table[i, empty[0]] = f
                break
            j = kick % b                         # deterministic eviction
            f, table[i, j] = int(row[j]), f
            i = int(_alt(np.int64(i), np.int64(f), m))
        else:
            stash.append((i, f))                 # overflow: never drop


def _unpack(seg_row) -> tuple:
    m = int(seg_row["m_buckets"])
    b = int(seg_row["slots"])
    table = np.frombuffer(seg_row["table"], dtype=np.uint16) \
        .astype(np.int64).reshape(m, b)
    raw = np.frombuffer(seg_row["stash"], dtype=np.int64)
    stash = [(int(raw[i]), int(raw[i + 1])) for i in range(0, len(raw), 2)]
    return m, b, table, stash


def _pack(bucket: int, m: int, b: int, table: np.ndarray, stash: list) -> pd.DataFrame:
    flat = np.array([v for pair in stash for v in pair], dtype=np.int64)
    return pd.DataFrame({
        "bucket": [bucket],
        "m_buckets": [m],
        "slots": [b],
        "table": [table.astype(np.uint16).tobytes()],
        "stash": [flat.tobytes()],
    })


def build_segments(seen: DataFrame, m_buckets: int = 1 << 16,
                   slots: int = 4) -> DataFrame:
    """seen(bucket, url_hash, ...) -> one cuckoo table row per bucket."""
    assert m_buckets & (m_buckets - 1) == 0, "m_buckets must be a power of 2"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((m_buckets, slots), dtype=np.int64)
        stash: list = []
        # sort: group row order from Spark is not deterministic, and cuckoo
        # layout (unlike a Bloom OR) is insertion-order-sensitive — sorting
        # makes segment bytes reproducible across runs/parallelism
        fp, i1, i2 = _fp_i1_i2(np.sort(pdf["url_hash"].to_numpy()), m_buckets)
        _insert(table, stash, fp, i1, i2, m_buckets)
        return _pack(int(pdf["bucket"].iloc[0]), m_buckets, slots, table, stash)

    return seen.groupBy("bucket").applyInPandas(build, schema=CUCKOO_SCHEMA)


def update_segments(segments: DataFrame, new_hashes: DataFrame,
                    m_buckets: int = 1 << 16, slots: int = 4) -> DataFrame:
    """Insert the round's NEW url hashes into the existing per-bucket
    tables — incremental maintenance, O(new URLs) per round.  First-seen
    buckets get a fresh table; untouched buckets pass through unchanged."""

    def upd(key, seg: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        if len(seg):
            m, b, table, stash = _unpack(seg.iloc[0])
        else:
            m, b, table, stash = m_buckets, slots, \
                np.zeros((m_buckets, slots), dtype=np.int64), []
        if len(new):
            fp, i1, i2 = _fp_i1_i2(np.sort(new["url_hash"].to_numpy()), m)
            _insert(table, stash, fp, i1, i2, m)
        return _pack(int(key[0]), m, b, table, stash)

    return (
        segments.groupBy("bucket")
        .cogroup(new_hashes.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(upd, schema=CUCKOO_SCHEMA)
    )


def delete_segments(segments: DataFrame, del_hashes: DataFrame) -> DataFrame:
    """Remove url hashes from the per-bucket tables (the operation Bloom
    cannot do; a recrawl/expiry policy retires URLs this way).  Standard
    cuckoo-filter contract: deleting an item that was never inserted is
    undefined — here it may clear a colliding fingerprint, which only ever
    *adds* exact-join backstop work, never false negatives for the caller's
    remaining items."""

    def dele(key, seg: pd.DataFrame, dels: pd.DataFrame) -> pd.DataFrame:
        if not len(seg):  # delete against a bucket with no segment: no-op
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int32"),
                "m_buckets": pd.Series([], dtype="int64"),
                "slots": pd.Series([], dtype="int32"),
                "table": pd.Series([], dtype=object),
                "stash": pd.Series([], dtype=object),
            })
        m, b, table, stash = _unpack(seg.iloc[0])
        if len(dels):
            fp, i1, i2 = _fp_i1_i2(np.sort(dels["url_hash"].to_numpy()), m)
            for n in range(len(fp)):
                f = int(fp[n])
                done = False
                for i in (int(i1[n]), int(i2[n])):
                    js = np.flatnonzero(table[i] == f)
                    if js.size:
                        table[i, js[0]] = 0
                        done = True
                        break
                if not done:
                    for si, (i, sf) in enumerate(stash):
                        if sf == f and i in (int(i1[n]), int(i2[n])):
                            stash.pop(si)
                            break
        return _pack(int(key[0]), m, b, table, stash)

    return (
        segments.groupBy("bucket")
        .cogroup(del_hashes.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(dele, schema=CUCKOO_SCHEMA)
    )


def filter_unseen(candidates: DataFrame, segments: DataFrame) -> DataFrame:
    """Cogrouped probe, same contract as ``bloom.filter_unseen``: output =
    candidates schema + ``maybe_seen`` boolean; negatives are definite."""
    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def probe(key, cand: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(seg) == 0:
            return cand.assign(maybe_seen=False)
        m, b, table, stash = _unpack(seg.iloc[0])
        fp, i1, i2 = _fp_i1_i2(cand["url_hash"].to_numpy(), m)
        maybe = _contains(table, fp, i1, i2)
        for i, f in stash:
            maybe |= (fp == f) & ((i1 == i) | (i2 == i))
        return cand.assign(maybe_seen=maybe)

    return (
        candidates.groupBy("bucket")
        .cogroup(segments.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )
