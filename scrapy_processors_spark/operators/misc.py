"""Misc operators: SelectJmes / JsonGet / GetAttr / CallMethod.

Reference: ``single_value.py:1201-1265``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jmespath  # public dependency, present in this environment
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op


class SelectJmes(Op):
    """JMESPath over dict/list values (reference ``single_value.py:1201-1247``).
    Kernel tier: values are Python objects mid-pipeline (e.g. after a
    ``json.loads`` stage).  For JSON *string* columns prefer :class:`JsonGet`
    (pure SQL tier)."""

    expression: str = None

    tier = "pandas"
    output_type = T.StringType()

    def process_value(self, value: Any) -> Any:
        (expression,) = self.unpack_context()
        return jmespath.search(expression, value)


class JsonGet(Op):
    """Spark-native companion: extract a dotted path from a JSON string
    column via ``get_json_object`` — the SQL-tier subset of SelectJmes
    (SURVEY.md §2.3 #20)."""

    expression: str = None

    tier = "sql"
    output_type = T.StringType()

    def process_value(self, value: str) -> Any:
        import json

        (expression,) = self.unpack_context()
        try:
            return jmespath.search(expression, json.loads(value))
        except (ValueError, TypeError):
            return None

    def to_column(self, col: Column) -> Column:
        (expression,) = self.unpack_context()
        return F.get_json_object(col, "$." + expression)


class GetAttr(Op):
    """``getattr(value, attr)`` (reference ``single_value.py:1250-1254``);
    SQL tier = struct field access."""

    attr: str = None

    tier = "sql"
    output_type = T.StringType()

    def process_value(self, value: Any) -> Any:
        (attr,) = self.unpack_context()
        return getattr(value, attr)

    def to_column(self, col: Column) -> Column:
        (attr,) = self.unpack_context()
        return col.getField(attr)


_METHOD_COLUMNS = {
    "upper": F.upper,
    "lower": F.lower,
    "strip": F.trim,
    "lstrip": F.ltrim,
    "rstrip": F.rtrim,
}


class CallMethod(Op):
    """``getattr(value, method)(*args, **kwargs)`` (reference
    ``single_value.py:1257-1265``).  Zero-arg methods with a known Column
    equivalent stay SQL tier; anything else is kernel tier."""

    method: str = None
    args: Tuple[Any, ...] = tuple()
    kwargs: Dict[str, Any] = dict()

    tier = "pandas"
    output_type = T.StringType()

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        method, args, kwargs = self.unpack_context()
        if method in _METHOD_COLUMNS and not args and not kwargs:
            self.tier = "sql"

    def process_value(self, value: Any) -> Any:
        method, args, kwargs = self.unpack_context()
        return getattr(value, method)(*args, **kwargs)

    def to_column(self, col: Column) -> Column:
        method, args, kwargs = self.unpack_context()
        if method in _METHOD_COLUMNS and not args and not kwargs:
            return _METHOD_COLUMNS[method](col)
        return super().to_column(col)
