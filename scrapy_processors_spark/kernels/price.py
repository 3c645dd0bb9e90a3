"""From-scratch price-string parsing kernel.

Replicates the observable behaviour of ``price_parser.Price.fromstring``
(the reference's dependency, ``single_value.py:594-790``) for the formats its
test-suite pins down (golden cases in ``tests/test_single_value.py:385-535``
and the integration golden ``cleaned_data.json``): amount text extraction,
thousands/decimal separator inference, currency symbol / ISO-4217 code
detection with ``currency_hint`` fallback.  Currency tables are public data.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import Optional

# First maximal run of digits possibly containing separators/spaces.
_NUM_RE = re.compile(r"\d(?:[\d\s., ]*\d)?")

_CURRENCY_SYMBOLS = (
    "€$£¥₹₽₩¢₪₫₴₦฿₱₲₵₸₺₼₾₿"
)
_ISO_CODES = {
    "USD", "EUR", "GBP", "JPY", "CNY", "CHF", "CAD", "AUD", "NZD", "SEK",
    "NOK", "DKK", "PLN", "CZK", "HUF", "RON", "BGN", "RUB", "UAH", "TRY",
    "INR", "IDR", "KRW", "MXN", "BRL", "ARS", "CLP", "COP", "PEN", "ZAR",
    "SGD", "HKD", "TWD", "THB", "MYR", "PHP", "VND", "ILS", "AED", "SAR",
}
_CURRENCY_RE = re.compile(
    "([" + re.escape(_CURRENCY_SYMBOLS) + "])|\\b(" + "|".join(_ISO_CODES) + ")\\b"
)


class ParsedPrice:
    """Price value object.  Deliberately NOT a tuple/iterable: MapCompose
    flattens iterables (reference ``arg_to_iter``), and the reference's
    ``price_parser.Price`` is a non-iterable attrs object."""

    __slots__ = ("amount", "currency", "amount_text")

    def __init__(self, amount: Optional[Decimal], currency: Optional[str],
                 amount_text: Optional[str]):
        self.amount = amount
        self.currency = currency
        self.amount_text = amount_text

    @property
    def amount_float(self) -> Optional[float]:
        return float(self.amount) if self.amount is not None else None

    def __repr__(self) -> str:
        return (f"ParsedPrice(amount={self.amount!r}, currency={self.currency!r}, "
                f"amount_text={self.amount_text!r})")

    def __eq__(self, other) -> bool:
        return (isinstance(other, ParsedPrice) and self.amount == other.amount
                and self.currency == other.currency
                and self.amount_text == other.amount_text)


def guess_decimal_separator(num: str) -> str:
    if num.count(".") > 1:
        return ","
    if num.count(",") > 1:
        return "."
    if "." in num and "," in num:
        return "." if num.rfind(".") > num.rfind(",") else ","
    if "," in num:
        _, _, right = num.rpartition(",")
        # ",000" => thousands separator; ",12" / ",1234" => decimal
        return "." if len(right) == 3 else ","
    return "."


def parse_number(num_text: str, decimal_separator: Optional[str] = None) -> Optional[Decimal]:
    num = num_text.strip().replace(" ", "").replace(" ", "")
    if not num:
        return None
    sep = decimal_separator or guess_decimal_separator(num)
    if sep == ".":
        num = num.replace(",", "")
    else:
        num = num.replace(".", "").replace(",", ".")
    try:
        return Decimal(num)
    except InvalidOperation:
        return None


def _currency_from_string(s: str) -> Optional[str]:
    m = _CURRENCY_RE.search(s)
    return m.group(0) if m else None


def parse_price(
    value: str,
    currency_hint: Optional[str] = None,
    decimal_separator: Optional[str] = None,
) -> ParsedPrice:
    if value is None:
        return ParsedPrice(None, None, None)
    m = _NUM_RE.search(value)
    amount_text = None
    amount = None
    if m:
        # trim trailing separators/spaces the greedy class may have eaten
        amount_text = m.group(0).rstrip(" ,. ")
        amount = parse_number(amount_text, decimal_separator)
    currency = _currency_from_string(value)
    if currency is None and currency_hint:
        currency = _currency_from_string(currency_hint) or currency_hint
    return ParsedPrice(amount, currency, amount_text)
