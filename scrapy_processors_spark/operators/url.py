"""URL operators (the north-star's "UrlProcessor canonicalization" — no such
processor exists in the reference; semantics defined in
``frontier/canonicalize.py``)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op
from scrapy_processors_spark.frontier.canonicalize import (
    canonicalize_url,
    canonicalize_url_py,
)


class UrlCanonicalize(Op):
    """Canonicalize a URL column (SQL tier; documented RFC 3986-derived
    rules).  The kernel variant additionally normalizes %XX escapes."""

    tier = "sql"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        return canonicalize_url_py(value)

    def to_column(self, col: Column) -> Column:
        return canonicalize_url(col)

    def kernel(self, s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else canonicalize_url_py(v))
