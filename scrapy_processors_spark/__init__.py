"""scrapy_processors_spark — a PySpark-native field-processing + crawl-frontier
engine with the capabilities of ``nicholas-mischke/scrapy-processors``
(reference, read-only, at /root/reference), rebuilt Spark-first.

Public surface mirrors the reference's ``__init__.py`` exports plus the new
frontier / datapipe layers.
"""

from scrapy_processors_spark.core.base import FunctionOp, Op, as_op
from scrapy_processors_spark.core.pipeline import Compose, MapCompose, Pipeline
from scrapy_processors_spark.operators.strings import (
    CharWhitespacePadding,
    Demojize,
    NormalizeWhitespace,
    RemoveEmojis,
    RemoveHTMLTags,
    StripQuotes,
    UnicodeEscape,
)
from scrapy_processors_spark.operators.numeric import (
    ExtractDigits,
    NormalizeNumericString,
    PriceParser,
    ToFloat,
)
from scrapy_processors_spark.operators.datetime_ops import (
    Date,
    DateTime,
    DateTimeExtraordinaire,
    Time,
)
from scrapy_processors_spark.operators.contact import Emails, PhoneNumbers, Socials
from scrapy_processors_spark.operators.misc import CallMethod, GetAttr, JsonGet, SelectJmes
from scrapy_processors_spark.operators.url import UrlCanonicalize
from scrapy_processors_spark.operators.reducers import (
    Coalesce,
    Flatten,
    Identity,
    Join,
    TakeAll,
    TakeAllTruthy,
    TakeFirst,
    TakeFirstTruthy,
)

# Prebuilt pipeline mirroring the reference's ``clean_string``
# (reference __init__.py:42-48).
clean_string = MapCompose(
    UnicodeEscape(),
    str.strip,
    StripQuotes(),
    NormalizeWhitespace(),
)

__all__ = [
    "Op", "FunctionOp", "as_op", "Pipeline", "Compose", "MapCompose",
    "UnicodeEscape", "NormalizeWhitespace", "CharWhitespacePadding",
    "StripQuotes", "RemoveHTMLTags", "Demojize", "RemoveEmojis",
    "ExtractDigits", "NormalizeNumericString", "PriceParser", "ToFloat",
    "DateTimeExtraordinaire", "DateTime", "Date", "Time",
    "Emails", "PhoneNumbers", "Socials",
    "SelectJmes", "JsonGet", "GetAttr", "CallMethod", "UrlCanonicalize",
    "TakeAll", "Identity", "TakeAllTruthy", "TakeFirst", "TakeFirstTruthy",
    "Coalesce", "Join", "Flatten",
    "clean_string",
]
