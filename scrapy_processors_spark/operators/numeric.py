"""Numeric / numeric-string operators.

Reference: ``single_value.py:556-790``.  ExtractDigits is pure SQL tier;
the price-based trio (NormalizeNumericString / PriceParser / ToFloat) shares
the from-scratch ``kernels.price`` parser (the reference's ``price_parser``
dependency re-implemented against its golden outputs).
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Optional, Tuple, Union

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op
from scrapy_processors_spark.core.regex_util import java_escape_char
from scrapy_processors_spark.kernels.price import (
    ParsedPrice,
    _currency_from_string,
    fast_amount_canonical,
    fast_price_match,
    parse_price,
)


class ExtractDigits(Op):
    """Find digit runs with allowed separators (reference
    ``single_value.py:556-591``).  Note the reference subtlety: the pattern
    ``\\d[\\d<seps>]*\\d`` never matches a lone single digit.  List-valued."""

    separators: Iterable[str] = {",", "."}

    tier = "sql"
    is_list_valued = True
    output_type = T.StringType()

    def _py_pattern(self) -> str:
        (separators,) = self.unpack_context()
        seps = [re.escape(s) for s in separators]
        return r"\d[\d{}]*\d".format("".join(seps))

    def _java_pattern(self) -> str:
        (separators,) = self.unpack_context()
        cls = "".join(java_escape_char(c) for s in separators for c in s)
        return r"(?U)\d[\d{}]*\d".format(cls)

    def process_value(self, value: str):
        return re.findall(self._py_pattern(), value)

    def kernel(self, s: pd.Series) -> pd.Series:
        pat = re.compile(self._py_pattern())
        return s.map(lambda v: None if v is None else pat.findall(v))

    def to_column(self, col: Column) -> Column:
        return F.regexp_extract_all(col, F.lit(self._java_pattern()), F.lit(0))


class NormalizeNumericString(Op):
    """Reformat a numeric string with target separators/rounding (reference
    ``single_value.py:594-682``).  Kernel-tier: CPython ``format(num, ',.Nf')``
    rounding is the spec (SURVEY.md §7.2)."""

    thousands_separator: str = ""
    decimal_separator: str = "."
    decimal_places: Optional[int] = None
    keep_trailing_zeros: bool = False
    input_decimal_separator: Optional[str] = None

    tier = "pandas"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        (thousands_separator, decimal_separator, decimal_places,
         keep_trailing_zeros, input_decimal_separator) = self.unpack_context()

        num = parse_price(value, decimal_separator=input_decimal_separator).amount_float

        if decimal_places is not None:
            num = f"{num:,.{decimal_places}f}"
        else:
            num = f"{num:,}"

        # two-phase placeholder swap, exactly as the reference (:671-676)
        num = num.replace(",", "THOUSANDS_SEP")
        num = num.replace(".", "DECIMAL_SEP")
        num = num.replace("THOUSANDS_SEP", thousands_separator)
        num = num.replace("DECIMAL_SEP", decimal_separator)

        if keep_trailing_zeros is False:
            num = num.rstrip("0").rstrip(decimal_separator)

        return num

    def kernel(self, s: pd.Series) -> pd.Series:
        # Context unpack hoisted out of the row loop (guide §4.5); the body
        # is ``process_value`` verbatim with the constants closed over.
        (thousands_separator, decimal_separator, decimal_places,
         keep_trailing_zeros, input_decimal_separator) = self.unpack_context()

        # Fast-path guard: only valid when the decimal separator is "." (the
        # shape the fast language always resolves to — kernels/price.py proof).
        use_fast = input_decimal_separator in (None, ".")

        def one(value):
            if value is None:
                return None
            m = fast_price_match(value) if use_fast else None
            if m is not None:
                ip, frac = m.group(2), m.group(3)
                digits = ip.replace(",", "") if "," in ip else ip
                num = float(digits + frac) if frac else float(digits)
            else:
                num = parse_price(
                    value, decimal_separator=input_decimal_separator).amount_float
            if decimal_places is not None:
                num = f"{num:,.{decimal_places}f}"
            else:
                num = f"{num:,}"
            num = num.replace(",", "THOUSANDS_SEP")
            num = num.replace(".", "DECIMAL_SEP")
            num = num.replace("THOUSANDS_SEP", thousands_separator)
            num = num.replace("DECIMAL_SEP", decimal_separator)
            if keep_trailing_zeros is False:
                num = num.rstrip("0").rstrip(decimal_separator)
            return num

        return s.map(one)


class PriceParser(Op):
    """Price string -> struct(amount, currency, amount_text, amount_float)
    (reference ``single_value.py:685-739``; parser provenance in
    ``kernels/price.py``).  ``amount`` is the exact Decimal repr string so the
    integration golden (``cleaned_data.json``) round-trips byte-identically."""

    return_attrs: Optional[Union[str, Tuple[str, ...]]] = None
    currency_hint: Optional[str] = None
    decimal_separator: Optional[str] = None

    tier = "pandas"

    _STRUCT = T.StructType([
        T.StructField("amount", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField("amount_text", T.StringType()),
        T.StructField("amount_float", T.DoubleType()),
    ])

    @property
    def output_type(self) -> T.DataType:
        attrs = self.context.get("return_attrs")
        if attrs is None:
            return self._STRUCT
        if attrs == "amount_float":
            return T.DoubleType()
        return T.StringType()

    def _parse(self, value: str) -> ParsedPrice:
        _, currency_hint, decimal_separator = self.unpack_context()
        return parse_price(value, currency_hint=currency_hint,
                           decimal_separator=decimal_separator)

    def process_value(self, value: str):
        price = self._parse(value)
        return_attrs = self.context.get("return_attrs")
        if return_attrs is None:
            return price
        if isinstance(return_attrs, str):
            return getattr(price, return_attrs)
        return None  # reference returns None for tuple return_attrs too (:735-739)

    def kernel(self, s: pd.Series) -> pd.Series:
        return_attrs = self.context.get("return_attrs")
        # hoisted from _parse (guide §4.5): unpack once per batch, not per row
        _, currency_hint, decimal_separator = self.unpack_context()
        # Fast path (kernels/price.py): valid only for "."-resolving inputs;
        # hint resolution hoisted out of the row loop.
        use_fast = decimal_separator in (None, ".")
        hint_resolved = ((_currency_from_string(currency_hint) or currency_hint)
                         if currency_hint else None)

        def components(v):
            """(amount_str, currency, amount_text, amount_float) for one row."""
            m = fast_price_match(v) if use_fast else None
            if m is not None:
                sym, ip, frac = m.group(1), m.group(2), m.group(3)
                digits = ip.replace(",", "") if "," in ip else ip
                num = digits + frac if frac else digits
                return (fast_amount_canonical(num),
                        sym if sym is not None else hint_resolved,
                        ip + frac if frac else ip,
                        float(num))
            p = parse_price(v, currency_hint=currency_hint,
                            decimal_separator=decimal_separator)
            return (None if p.amount is None else str(p.amount),
                    p.currency, p.amount_text, p.amount_float)

        if return_attrs is None:
            def one(v):
                if v is None:
                    return None
                amount, currency, amount_text, amount_float = components(v)
                return {
                    "amount": amount,
                    "currency": currency,
                    "amount_text": amount_text,
                    "amount_float": amount_float,
                }
        elif isinstance(return_attrs, str) and return_attrs in (
                "amount", "currency", "amount_text", "amount_float"):
            idx = {"amount": 0, "currency": 1,
                   "amount_text": 2, "amount_float": 3}[return_attrs]

            def one(v):
                return None if v is None else components(v)[idx]
        elif isinstance(return_attrs, str):
            # arbitrary attribute name: keep the generic getattr semantics
            def one(v):
                if v is None:
                    return None
                p = parse_price(v, currency_hint=currency_hint,
                                decimal_separator=decimal_separator)
                attr = getattr(p, return_attrs)
                return (str(attr) if return_attrs == "amount"
                        and attr is not None else attr)
        else:
            def one(v):
                return None

        return s.map(one)


class ToFloat(Op):
    """Price-parse -> float (reference ``single_value.py:742-790``).  Note the
    reference quirk preserved: ``decimal_places=0`` is falsy, so no rounding."""

    decimal_places: Optional[int] = None
    decimal_separator: Optional[str] = None

    tier = "pandas"
    output_type = T.DoubleType()

    def process_value(self, value: str) -> Optional[float]:
        decimal_places, decimal_separator = self.unpack_context()
        num = parse_price(value, decimal_separator=decimal_separator).amount_float
        return round(num, decimal_places) if decimal_places else num

    def kernel(self, s: pd.Series) -> pd.Series:
        # Context unpack hoisted out of the row loop (guide §4.5).
        decimal_places, decimal_separator = self.unpack_context()
        # Fast path (kernels/price.py): valid only for "."-resolving inputs.
        use_fast = decimal_separator in (None, ".")

        def one(value):
            if value is None:
                return None
            m = fast_price_match(value) if use_fast else None
            if m is not None:
                ip, frac = m.group(2), m.group(3)
                digits = ip.replace(",", "") if "," in ip else ip
                num = float(digits + frac) if frac else float(digits)
            else:
                num = parse_price(
                    value, decimal_separator=decimal_separator).amount_float
            return round(num, decimal_places) if decimal_places else num

        return s.map(one)
