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


# ---------------------------------------------------------------------------
# Fast path: anchored ASCII shape `SYM? digits[,ddd]* [.frac]?` that covers the
# overwhelmingly common machine-formatted price strings.  For any value in this
# language the full ``parse_price`` provably reduces to direct string/float
# ops, so hot kernels can skip the search/guess/Decimal pipeline and fall back
# to ``parse_price`` for everything else.  Proof of equivalence on the matched
# language (each step against the general path above):
#
# - ``_NUM_RE.search`` finds the maximal run from the first digit: exactly
#   ``digits[,ddd]*[.frac]`` (commas/dot are in its class, the optional
#   leading symbol is not, the string ends after the fraction).  The
#   ``rstrip(" ,.\xa0")`` and the space-removal in ``parse_number`` are
#   no-ops (the run ends in a digit and contains no spaces).
# - ``guess_decimal_separator`` always yields ".": dots <= 1; with >= 2
#   grouping commas the ``count(",") > 1`` rule fires; with exactly one comma
#   either the dot sits after it (``rfind`` rule) or the post-comma block has
#   length 3 (",ddd" thousands rule).  Hence the fast path is only valid when
#   the caller's ``decimal_separator`` is None or "." (callers must guard).
# - After comma removal ``num`` matches ``^[0-9]+(\.[0-9]+)?$``:
#   ``Decimal(num)`` cannot fail; ``str(Decimal(num))`` only strips redundant
#   leading zeros (no exponent form without an exponent in the input), and
#   ``float(num) == float(Decimal(num))`` — both are correctly-rounded
#   decimal-to-binary conversions, both overflowing to ``inf`` identically.
# - ``_CURRENCY_RE.search(value)``: ISO codes need ASCII letters, which the
#   language excludes, so the only possible match is the leading symbol (the
#   class is ``[0-9],.`` otherwise, disjoint from ``_CURRENCY_SYMBOLS``).
#
# ``[0-9]`` (not ``\d``) is deliberate: Python ``\d`` matches Unicode digits,
# where ``str(Decimal("٣٤")) == "34"`` normalizes the script — those values
# must take the slow path.
_FAST_RE = re.compile(
    "([" + re.escape(_CURRENCY_SYMBOLS) + "])?"
    r"([0-9]{1,3}(?:,[0-9]{3})+|[0-9]+)(\.[0-9]+)?\Z")
_LEADING_ZEROS = re.compile(r"^0+(?=\d)")

fast_price_match = _FAST_RE.match


def fast_amount_canonical(num: str) -> str:
    """``str(Decimal(num))`` for fast-path ``num`` (ASCII digits + one dot):
    strip redundant leading zeros, keeping one before a dot."""
    if num[0] == "0" and len(num) > 1 and num[1] != ".":
        return _LEADING_ZEROS.sub("", num)
    return num


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
