"""Structured Streaming surface for the field-processing pipelines.

The reference has no streaming (SURVEY.md §2.6); this layer shows the same
operator pipelines are streaming-safe: every op compiles to stateless Column
expressions / pandas kernels, so they drop into ``readStream -> transform ->
writeStream`` unchanged.  Stateful pieces (windowed per-host rates with
watermarked late data) use the standard windowed-aggregation pattern.

The crawl frontier itself deliberately stays an *iterative batch* loop
(SURVEY.md §2.6): crawl rounds are natural barriers and resume-exactly
favours explicit snapshots over streaming state stores.

State-store provider: both the watermarked aggregation here and the
stateful dedup in ``stateful.py`` run on the session's configured provider
(``spark.sql.streaming.stateStore.providerClass``).  Use
``stateful.STATE_STORE_PROVIDERS["rocksdb"]`` (or pass
``state_store="rocksdb"`` to ``dedup_urls_stream_to_parquet``) when state
outgrows executor memory — RocksDB keeps a disk-backed working set instead
of HDFSBacked's all-in-RAM retention.  The checkpoint pins the provider at
first start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrapy_processors_spark import RemoveHTMLTags, clean_string
from scrapy_processors_spark.datapipe import textstats
from scrapy_processors_spark.frontier.canonicalize import canonicalize_url, url_host


def clean_pages_stream(pages: DataFrame) -> DataFrame:
    """Stateless per-page transform chain over a streaming pages frame
    ``(url, warc_ts, html)`` -> cleaned/canonical columns.  Works identically
    on batch frames (same plan, streaming-agnostic)."""
    html_text = RemoveHTMLTags()(F.col("html"))
    return pages.select(
        canonicalize_url(F.col("url")).alias("url"),
        F.col("warc_ts"),
        clean_string.apply_scalar(html_text).alias("text"),
        textstats.token_count_ws(html_text).alias("n_tokens"),
        textstats.lang_id(html_text).alias("lang_guess"),
        url_host(F.col("url")).alias("host"),
    )


def host_rates_stream(pages: DataFrame, window: str = "10 seconds",
                      watermark: str = "30 seconds") -> DataFrame:
    """Watermarked windowed per-host page counts (late data handled by the
    watermark; state store bounded)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window),
                 url_host(F.col("url")).alias("host"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select("window", "host", "n_pages")
    )
