"""Cuckoo-filter URL-seen segments (the "cuckoo" half of north_star's
"Bloom/cuckoo URL-seen set"): no false negatives, sane FPR, incremental
update, deletion (the capability Bloom lacks), stash overflow safety, and
end-to-end crawl equality with the exact path."""

from pyspark.sql import functions as F

from scrapy_processors_spark.frontier import cuckoo
from scrapy_processors_spark.frontier.crawler import CrawlConfig, run_crawl
from tests.test_frontier import CFG, _fetch_order, _seen_set


def _hashes(spark, lo, hi, n_buckets=4):
    return spark.range(lo, hi).select(
        (F.col("id") % n_buckets).cast("int").alias("bucket"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))


def test_cuckoo_no_false_negatives(spark):
    df = _hashes(spark, 0, 2000)
    segs = cuckoo.build_segments(df, m_buckets=1 << 10)
    tagged = cuckoo.filter_unseen(df, segs)
    assert tagged.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_false_positive_rate(spark):
    inserted = _hashes(spark, 0, 2000)
    probes = _hashes(spark, 10_000, 30_000)
    segs = cuckoo.build_segments(inserted, m_buckets=1 << 10)
    fp = cuckoo.filter_unseen(probes, segs).where(F.col("maybe_seen")).count()
    # 4x16-bit slots: theoretical FPR ~ 2*4/2^16 ~ 0.012%; allow slack
    assert fp / 20_000 < 0.005


def test_cuckoo_incremental_update_membership(spark):
    """Inserting a delta into existing segments preserves membership of both
    batches (layout may differ from a one-shot build — cuckoo placement is
    insertion-order-sensitive — but membership must not)."""
    a = _hashes(spark, 0, 1000)
    b = _hashes(spark, 1000, 1500)
    segs = cuckoo.update_segments(
        cuckoo.build_segments(a, m_buckets=1 << 10), b, m_buckets=1 << 10)
    both = a.unionByName(b)
    assert cuckoo.filter_unseen(both, segs) \
        .where(~F.col("maybe_seen")).count() == 0

    # a delta introducing a brand-new bucket creates its segment
    c = spark.range(2000, 2050).select(
        F.lit(9).cast("int").alias("bucket"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    segs2 = cuckoo.update_segments(segs, c, m_buckets=1 << 10)
    assert cuckoo.filter_unseen(c, segs2) \
        .where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_delete(spark):
    """Deletion removes the deleted hashes' membership and keeps the rest —
    the recrawl/expiry operation a Bloom filter cannot support."""
    keep = _hashes(spark, 0, 500)
    drop = _hashes(spark, 500, 600)
    segs = cuckoo.build_segments(keep.unionByName(drop), m_buckets=1 << 10)
    segs = cuckoo.delete_segments(segs, drop)
    # kept items: still no false negatives
    assert cuckoo.filter_unseen(keep, segs) \
        .where(~F.col("maybe_seen")).count() == 0
    # dropped items: (almost) all now read unseen; fingerprint collisions
    # with kept items may leave a handful positive, never the reverse
    still = cuckoo.filter_unseen(drop, segs).where(F.col("maybe_seen")).count()
    assert still <= 2


def test_cuckoo_stash_overflow_no_false_negatives(spark):
    """Grossly undersized table (2 buckets x 4 slots for 200 items) forces
    insertion overflow into the stash; membership must still hold for every
    inserted item — overflow may cost backstop work, never correctness."""
    df = _hashes(spark, 0, 200, n_buckets=1)
    segs = cuckoo.build_segments(df, m_buckets=2)
    row = segs.collect()[0]
    assert len(row["stash"]) > 0  # overflow actually happened
    assert cuckoo.filter_unseen(df, segs) \
        .where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_build_deterministic(spark):
    """Segment bytes are reproducible across builds and shuffle settings
    (hashes are sorted before insertion, so group row order is irrelevant)."""
    df = _hashes(spark, 0, 1500)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        s1 = {r["bucket"]: (bytes(r["table"]), bytes(r["stash"]))
              for r in cuckoo.build_segments(df, m_buckets=1 << 10).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        s2 = {r["bucket"]: (bytes(r["table"]), bytes(r["stash"]))
              for r in cuckoo.build_segments(df, m_buckets=1 << 10).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert s1 == s2


def test_crawl_cuckoo_path_equals_exact(spark):
    s1 = run_crawl(spark, CrawlConfig(**CFG, use_bloom=False))
    s2 = run_crawl(spark, CrawlConfig(**CFG, filter_kind="cuckoo",
                                      cuckoo_m_buckets=1 << 12))
    assert _fetch_order(s1) == _fetch_order(s2)
    assert _seen_set(s1) == _seen_set(s2)


def test_crawl_cuckoo_checkpoint_resume(spark, tmp_path):
    """Cuckoo segments persist in the checkpoint and the resumed crawl is
    identical to the uninterrupted one."""
    root = str(tmp_path / "ckpt")
    full = run_crawl(spark, CrawlConfig(
        **{**CFG, "max_rounds": 4}, filter_kind="cuckoo",
        cuckoo_m_buckets=1 << 12))
    cfg1 = CrawlConfig(**{**CFG, "max_rounds": 2}, filter_kind="cuckoo",
                       cuckoo_m_buckets=1 << 12, checkpoint_root=root)
    run_crawl(spark, cfg1)
    cfg2 = CrawlConfig(**{**CFG, "max_rounds": 4}, filter_kind="cuckoo",
                       cuckoo_m_buckets=1 << 12, checkpoint_root=root)
    resumed = run_crawl(spark, cfg2, resume=True)
    assert _fetch_order(full) == _fetch_order(resumed)
    assert _seen_set(full) == _seen_set(resumed)
