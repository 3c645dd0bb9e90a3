"""Pages table source/sink — the driver-specified input shape
(BASELINE.json input_hint): ``(url string, warc_ts timestamp, html binary,
text string, lang string)``.

Storage is Iceberg-style partitioned parquet (host-bucket partitions so
frontier lookups and Bloom segments co-locate); real Iceberg is a config
swap (SURVEY.md §2.5).  ``synthesize_pages`` generates a deterministic
corpus — html built from a template embedding dirty values + outlinks from
the synthetic crawl graph — with ``text`` holding the expected extraction
(the byte-identical oracle column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.frontier import graph
from scrapy_processors_spark.frontier.canonicalize import url_host

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

N_BUCKETS = 64


def write_pages(df: DataFrame, path: str) -> None:
    out = df.withColumn(
        "bucket", F.pmod(F.hash(url_host(F.col("url"))), F.lit(N_BUCKETS)).cast("int"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def synthesize_pages(spark: SparkSession, n_pages: int = 1000,
                     n_hosts: int = 100, words_per_page: int = 30) -> DataFrame:
    """Deterministic pages corpus.  ``text`` is built from the SAME template
    terms as ``html``, so ``RemoveHTMLTags(html) == ' ' + title + ' ' + body
    + link anchors`` exactly — the per-url byte-identical invariant."""
    base = spark.range(n_pages).select(
        F.concat(F.lit("https://host"),
                 F.pmod(F.xxhash64("id", F.lit("h")), F.lit(n_hosts)).cast("string"),
                 F.lit(".example.com/doc/"), F.col("id").cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.col("id"),
    )
    body = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(words_per_page)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64("url", i), F.lit(5000)).cast("string")),
    ))
    title = F.concat(F.lit("Page "), F.col("id").cast("string"))
    links = graph.outlinks(F.col("url"), max_degree=4, n_hosts=n_hosts)
    anchors = F.aggregate(
        links, F.lit(""),
        lambda acc, u: F.concat(acc, F.lit('<a href="'), u, F.lit('">L</a>')),
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("pt")),
        (F.pmod(F.xxhash64("url", F.lit("lang")), F.lit(4)) + 1).cast("int"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body><p>"),
        body, F.lit("</p>"), anchors, F.lit("</body></html>"),
    )
    # html.parser data events: title text + body text + one 'L' per anchor
    expected_text = F.concat(
        title, body,
        F.concat_ws("", F.transform(links, lambda _: F.lit("L"))),
    )
    return base.select(
        "url", "warc_ts",
        F.encode(html_str, "utf-8").alias("html"),
        expected_text.alias("text"),
        lang.alias("lang"),
    )
