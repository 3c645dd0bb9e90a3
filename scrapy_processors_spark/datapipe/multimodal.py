"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, in which
case a clearly-marked deterministic fake derives a fixed-size feature vector
from the bytes (length + byte histogram moments).  Everything Spark-side —
schema, batch iteration, partitioning, output shape — is real and tested, so
swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("duration_ms", T.LongType()),   # typed-metadata passthrough
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def _fake_decode(buf: bytes) -> List[float]:
    """DETERMINISTIC FAKE decode — stands in for image/audio decoding.
    Derives FEATURE_DIM moments from the raw bytes; replace with a real
    decoder (PIL/librosa/ffmpeg) outside this sandbox."""
    if not buf:
        return [0.0] * FEATURE_DIM
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(a, FEATURE_DIM)
    # exact sum/len division (integer-valued doubles sum exactly, so the
    # result is bit-identical to any engine computing SUM(byte)/COUNT)
    return [float(c.sum()) / len(c) if len(c) else 0.0 for c in chunks]


def decode_image(buf: bytes, fake: bool = False) -> List[float]:
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/opencv — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    return _fake_decode(buf)


def decode_audio(buf: bytes, fake: bool = False) -> List[float]:
    """Audio stand-in: per-chunk mean SQUARE (an RMS-flavored moment so the
    audio path is numerically distinct from the image path).  byte^2 <=
    65025 and chunk sums stay far under 2^53 — exact doubles, oracle-safe."""
    if not fake:
        raise NotImplementedError(
            "real audio decode requires librosa/ffmpeg — not available in "
            "this container; pass fake=True for the deterministic stand-in"
        )
    if not buf:
        return [0.0] * FEATURE_DIM
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(a * a, FEATURE_DIM)
    return [float(c.sum()) / len(c) if len(c) else 0.0 for c in chunks]


def decode_video(buf: bytes, fake: bool = False) -> List[float]:
    """Video stand-in: frame sampling as a stride-2 byte subsequence, then
    the image chunk-mean fold — models decode-then-sample plumbing."""
    if not fake:
        raise NotImplementedError(
            "real video decode requires ffmpeg — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    # None payload guard like the image/audio paths (ADVICE r03: buf[::2]
    # on None raised TypeError and aborted the whole Spark stage)
    if not buf:
        return [0.0] * FEATURE_DIM
    return _fake_decode(buf[::2])


_DECODERS = {"image": decode_image, "audio": decode_audio, "video": decode_video}


def extract_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` keeps binary payloads inside Arrow buffers (no per-row
    pickling); at scale, upstream should repartition by size so batches stay
    within executor memory (binary columns dominate the batch footprint).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds = [m["kind"] if m else None for m in pdf["meta"]]
            feats = [
                _DECODERS.get(k, decode_image)(b, fake=fake)
                for k, b in zip(kinds, pdf["media"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": kinds,
                "n_bytes": [len(b) if b is not None else 0 for b in pdf["media"]],
                "duration_ms": [m["duration_ms"] if m else 0 for m in pdf["meta"]],
                "features": feats,
            })

    return media_df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from documents (text bytes as payload)
    for tests/benchmarks — no external data.  ``doc_id % 3`` cycles the kind
    image/audio/video with kind-typed metadata (image gets dimensions,
    audio/video get byte-derived durations), so the per-kind decode dispatch
    and metadata plumbing are actually discriminated (VERDICT r02 #7)."""
    kind_idx = F.pmod(F.col("doc_id"), F.lit(3))
    n_bytes = F.octet_length(F.encode("text", "utf-8"))
    kind = (F.when(kind_idx == 0, F.lit("image"))
             .when(kind_idx == 1, F.lit("audio"))
             .otherwise(F.lit("video")))
    mime = (F.when(kind_idx == 0, F.lit("image/png"))
             .when(kind_idx == 1, F.lit("audio/wav"))
             .otherwise(F.lit("video/mp4")))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            kind.alias("kind"),
            mime.alias("mime"),
            F.when(kind_idx == 0, F.lit(640)).otherwise(F.lit(0)).alias("width"),
            F.when(kind_idx == 0, F.lit(480)).otherwise(F.lit(0)).alias("height"),
            (F.when(kind_idx == 1, n_bytes)
              .when(kind_idx == 2, 2 * n_bytes)
              .otherwise(F.lit(0))).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
