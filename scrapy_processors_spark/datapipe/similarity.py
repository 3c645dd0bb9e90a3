"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force top-k — query set broadcast against the
  candidate table (crossJoin with a broadcast hint: no shuffle of the big
  side; each executor scans its candidate partitions once), ranked with a
  window partitioned by query id.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic md5-seeded planes) shrink the candidate set per query to its
  bucket before the exact cosine rank.  At 100 TB the bucket join shuffles
  only (query, bucket) pairs, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scrapy_processors_spark.datapipe.dedup import cosine_similarity


def cosine_topk(queries: DataFrame, candidates: DataFrame, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 4) -> DataFrame:
    """Brute-force cosine top-k.  ``queries`` is expected to be small (it is
    broadcast); ranking ties break on candidate id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), round_digits).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane-{seed}-{i}".encode()).digest()
        for b in h:
            vals.append((b / 255.0) - 0.5)
            if len(vals) == dim:
                break
        i += 1
    return vals


def lsh_bucket(vec, planes) -> "F.Column":
    """Signed-projection bucket id: bit p = sign(<vec, plane_p>)."""
    bits = []
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_recall(queries: DataFrame, candidates: DataFrame, k: int = 3,
               **lsh_kwargs) -> float:
    """recall@k of the LSH-bucketed ANN vs the brute-force baseline:
    |lsh_topk ∩ exact_topk| / |exact_topk| over all queries.  Run at test/
    bench scale to quantify the bucketing's accuracy loss (the scale path is
    only 'done' once this number is reported — VERDICT r01 §5)."""
    exact = cosine_topk(queries, candidates, k=k).select("query_id", "cand_id")
    approx = lsh_bucketed_topk(queries, candidates, k=k, **lsh_kwargs) \
        .select("query_id", "cand_id")
    n_exact = exact.count()
    if n_exact == 0:
        return 1.0
    n_hit = exact.join(approx, on=["query_id", "cand_id"], how="left_semi").count()
    return round(n_hit / n_exact, 4)


def lsh_bucketed_topk(queries: DataFrame, candidates: DataFrame, k: int = 3,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int = 64, n_planes: int = 4,
                      round_digits: int = 4) -> DataFrame:
    """IVF/LSH-style ANN: join only within the query's hyperplane bucket.
    Recall < 1 by construction; the brute-force variant is the correctness
    baseline."""
    planes = [_hyperplane(dim, s) for s in range(n_planes)]
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q).join(c, on="bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), round_digits).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
