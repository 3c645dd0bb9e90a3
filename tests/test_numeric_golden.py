"""Golden parity for numeric ops (reference tests/test_single_value.py:346-535)."""

import math

import pytest

from scrapy_processors_spark import ExtractDigits, NormalizeNumericString, PriceParser, ToFloat
from tests.conftest import run_scalar


def wrap(v):
    return f"This is some text {v} This is some more text"


ED_DEFAULT = ["1000", "1,000", "1.000", "1,000.12", "1.000,12"]


@pytest.mark.parametrize("value", ED_DEFAULT)
def test_extract_digits_py(value):
    assert ExtractDigits().process_value(wrap(value)) == [value]


ED_CTX = [
    ("1 000.12", [" ", "."]),
    ("123", {}),
    ("123-456-7890", ["-"]),
    ("1234 5678 9012 3456", [" "]),
    ("2023-06-19 at 12:30", [" at ", "-", ":"]),
    ("1:000-12", [":", "-"]),
]


@pytest.mark.parametrize("value,seps", ED_CTX)
def test_extract_digits_ctx_py(value, seps):
    op = ExtractDigits()
    ctx = {"separators": seps} if seps else {}
    assert op.with_context(**ctx).process_value(wrap(value)) == [value]


def test_extract_digits_spark(spark):
    op = ExtractDigits()
    assert run_scalar(spark, op, [wrap(v) for v in ED_DEFAULT]) == [[v] for v in ED_DEFAULT]
    for value, seps in ED_CTX:
        o = op.with_context(separators=seps) if seps else op
        assert run_scalar(spark, o, [wrap(value)]) == [[value]]


NNS_SEPARATORS = [
    ({"thousands_separator": ",", "decimal_separator": "."}, "1000.75", "1,000.75"),
    ({"thousands_separator": ".", "decimal_separator": ","}, "1000.75", "1.000,75"),
    ({"thousands_separator": " ", "decimal_separator": "."}, "1000.75", "1 000.75"),
    ({"thousands_separator": " ", "decimal_separator": ","}, "1000.75", "1 000,75"),
    ({"thousands_separator": "", "decimal_separator": "."}, "1000.75", "1000.75"),
    ({"thousands_separator": "", "decimal_separator": ","}, "1000.75", "1000,75"),
]

NNS_ROUNDING = [
    ({"decimal_places": 0}, "1000.75", "1001"),
    ({"decimal_places": 1}, "1000.75", "1000.8"),
    ({"decimal_places": 2}, "1000.75", "1000.75"),
    ({"decimal_places": 3}, "1000.75", "1000.75"),
]

NNS_CTX = [
    ({"keep_trailing_zeros": False, "input_decimal_separator": "."}, "1,000.000", "1000"),
    ({"decimal_places": 2, "keep_trailing_zeros": True, "input_decimal_separator": "."},
     "1,000.000", "1000.00"),
]


@pytest.mark.parametrize("ctx,inp,exp", NNS_SEPARATORS + NNS_ROUNDING + NNS_CTX)
def test_nns_py(ctx, inp, exp):
    assert NormalizeNumericString(**ctx).process_value(inp) == exp


def test_nns_spark(spark):
    for ctx, inp, exp in NNS_SEPARATORS + NNS_ROUNDING + NNS_CTX:
        assert run_scalar(spark, NormalizeNumericString(**ctx), [inp]) == [exp]


PRICE_CASES = [
    ("USD 100.00", {}, 100.00, "USD"),
    ("$250,000.00", {}, 250000.00, "$"),
    ("EUR 50.99", {}, 50.99, "EUR"),
    ("€22,90", {"decimal_separator": ","}, 22.90, "€"),
    ("£75.50", {}, 75.50, "£"),
    ("¥1,500.50", {}, 1500.50, "¥"),
    ("100.00", {"currency_hint": "USD"}, 100.00, "USD"),
    ("50.99", {"currency_hint": "EUR"}, 50.99, "EUR"),
    ("75.50", {"currency_hint": "£"}, 75.50, "£"),
]


@pytest.mark.parametrize("inp,ctx,amount,currency", PRICE_CASES)
def test_price_parser_py(inp, ctx, amount, currency):
    price = PriceParser(**ctx).process_value(inp)
    assert math.isclose(float(price.amount), amount, rel_tol=1e-9)
    assert price.currency == currency


def test_price_parser_spark(spark):
    for inp, ctx, amount, currency in PRICE_CASES:
        (row,) = run_scalar(spark, PriceParser(**ctx), [inp])
        assert math.isclose(float(row["amount"]), amount, rel_tol=1e-9)
        assert row["currency"] == currency


TOFLOAT_CASES = [
    ("1", {}, 1.0),
    ("1.0", {}, 1.0),
    ("1.5", {}, 1.5),
    ("1,000", {}, 1000.0),
    ("100.000", {"decimal_separator": "."}, 100.0),
]


@pytest.mark.parametrize("inp,ctx,exp", TOFLOAT_CASES)
def test_to_float_py(inp, ctx, exp):
    assert ToFloat(**ctx).process_value(inp) == exp


def test_to_float_spark(spark):
    for inp, ctx, exp in TOFLOAT_CASES:
        assert run_scalar(spark, ToFloat(**ctx), [inp]) == [exp]


# --- r6 fast-path equivalence: kernel vs process_value on the price trio ---
#
# The r6 optimization adds an anchored ASCII fast path (kernels/price.py
# _FAST_RE) to the three price kernels; this fuzz corpus straddles the
# fast/slow boundary (grouped/ungrouped digits, leading zeros, Unicode
# digits, symbols, hints, non-"." separators that disable the fast path).

FUZZ_VALUES = [
    "$1,234.56", "1.234,56", "1 234,56", "12", "1", "0", "007.50", "00.5",
    ".5", "1,23,456", "1.2.3.4", "price 12,345 USD", "EUR 9,99", "abc", "",
    "  ", "12\t34", "1,000", "1,0000", "12,34", "9.99 €", "5.", "5,",
    "000", "0.00", "123456789012345678901234567890.5", "99,999,999.99",
    "$0.99", "£1,000,000", "x1,234.567y", "12.345.678,90", "3,141",
    "٣٤", "١٢.٥", "0", "10", "010", "0.5", "00.50",
    "9" * 320, "1," , ",1", "JPY 1000", "$", "USD",
]

PRICE_FUZZ_CTX = [
    {}, {"currency_hint": "USD"}, {"currency_hint": "zł"},
    {"decimal_separator": ","}, {"decimal_separator": "."},
    {"currency_hint": "EUR", "decimal_separator": ","},
]


def _kernel_vals(op, values):
    import pandas as pd

    out = op.kernel(pd.Series(values, dtype=object))
    # the exec layer (FlatBatch.drop_none) treats NaN as null, so a
    # float-dtype map result's NaN is equivalent to None here
    return [None if v is None or (isinstance(v, float) and v != v) else v
            for v in out]


@pytest.mark.parametrize("ctx", PRICE_FUZZ_CTX)
def test_price_parser_kernel_matches_process_value(ctx):
    op = PriceParser(**ctx)
    got = _kernel_vals(op, FUZZ_VALUES)
    for v, g in zip(FUZZ_VALUES, got):
        p = op.process_value(v)
        exp = {
            "amount": None if p.amount is None else str(p.amount),
            "currency": p.currency,
            "amount_text": p.amount_text,
            "amount_float": p.amount_float,
        }
        assert g == exp, f"{v!r} ctx={ctx}: {g} != {exp}"


@pytest.mark.parametrize("ctx", [
    {"return_attrs": "amount"}, {"return_attrs": "amount_float"},
    {"return_attrs": "currency", "currency_hint": "USD"},
    {"return_attrs": "amount_text"},
])
def test_price_parser_kernel_return_attrs(ctx):
    op = PriceParser(**ctx)
    got = _kernel_vals(op, FUZZ_VALUES)
    for v, g in zip(FUZZ_VALUES, got):
        exp = op.process_value(v)
        if ctx["return_attrs"] == "amount" and exp is not None:
            exp = str(exp)  # kernel contract: Decimal serialized as repr string
        assert g == exp, f"{v!r} ctx={ctx}"


@pytest.mark.parametrize("ctx", [
    {}, {"decimal_places": 2}, {"decimal_separator": ","},
    {"decimal_places": 3, "decimal_separator": "."},
])
def test_to_float_kernel_matches_process_value(ctx):
    op = ToFloat(**ctx)
    for v in FUZZ_VALUES:
        try:
            exp = op.process_value(v)
        except Exception as e:  # noqa: BLE001 - error parity
            with pytest.raises(type(e)):
                _kernel_vals(op, [v])
            continue
        assert _kernel_vals(op, [v]) == [exp], f"{v!r} ctx={ctx}"


@pytest.mark.parametrize("ctx", [
    {"decimal_places": 2, "keep_trailing_zeros": True,
     "input_decimal_separator": "."},
    {"thousands_separator": ".", "decimal_separator": ","},
    {},
])
def test_nns_kernel_matches_process_value(ctx):
    op = NormalizeNumericString(**ctx)
    for v in FUZZ_VALUES:
        try:
            exp = op.process_value(v)
        except Exception as e:  # noqa: BLE001 - error parity
            with pytest.raises(type(e)):
                _kernel_vals(op, [v])
            continue
        assert _kernel_vals(op, [v]) == [exp], f"{v!r} ctx={ctx}"
