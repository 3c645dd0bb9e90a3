"""Golden parity for list reducers (reference tests/test_multi_values.py) —
Python ground truth (exact, heterogeneous lists) + Spark column tier (typed
arrays, the static specialization)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark import (
    Coalesce,
    Flatten,
    Join,
    TakeAll,
    TakeAllTruthy,
    TakeFirst,
    TakeFirstTruthy,
)


# ------------------------------------------------------------- python parity
def test_take_all_py():
    p = TakeAll()
    assert p.run_python([1, 2, 3]) == [1, 2, 3]
    assert p.run_python("apple") == "apple"


@pytest.mark.parametrize("inp,exp", [
    ([True, 123, "abc", [1, 2, 3]], [True, 123, "abc", [1, 2, 3]]),
    ([None, False, "", [], 0], []),
    ([0, "", False, 7, [], None, "empty"], [7, "empty"]),
    ([], []),
])
def test_take_all_truthy_py(inp, exp):
    assert TakeAllTruthy(default=[]).run_python(inp) == exp


@pytest.mark.parametrize("inp,exp", [
    ([1, 2, 3], 1),
    ("apple", "apple"),
    ([None, "", 10], 10),
])
def test_take_first_py(inp, exp):
    assert TakeFirst().run_python(inp) == exp


@pytest.mark.parametrize("inp,exp", [
    ([True, 123, "abc", [1, 2, 3]], True),
    ([None, False, "", [], 7], 7),
    ([0, "", False, "empty", [], None], "empty"),
    ([], None),
])
def test_take_first_truthy_py(inp, exp):
    assert TakeFirstTruthy(default=None).run_python(inp) == exp


@pytest.mark.parametrize("inp,exp", [
    ([None, False, "", [], 0], False),
    ([None, None, "Hello"], "Hello"),
])
def test_coalesce_py(inp, exp):
    assert Coalesce().run_python(inp) == exp


def test_join_py():
    assert Join().run_python([1, 2, 3]) == "1 2 3"
    assert Join().run_python([1, 2, 3], separator=" - ") == "1 - 2 - 3"


def test_flatten_py():
    assert Flatten().run_python([[1, 2, 3], [4, 5, 6]]) == [1, 2, 3, 4, 5, 6]


# ------------------------------------------------------------- spark tier
def _arr_df(spark, rows, elem="string"):
    return spark.createDataFrame([(i, v) for i, v in enumerate(rows)],
                                 f"id long, v array<{elem}>")


def _reduce(spark, op, rows, elem="string"):
    df = _arr_df(spark, rows, elem)
    out = df.select("id", op(F.col("v")).alias("r")).orderBy("id").collect()
    return [r["r"] for r in out]


def test_take_first_spark(spark):
    got = _reduce(spark, TakeFirst(), [["a", "b"], [None, "", "c"], [None, ""]])
    assert got == ["a", "c", None]


def test_take_first_truthy_spark(spark):
    got = _reduce(spark, TakeFirstTruthy(), [["", "x"], ["", None], ["hey"]])
    assert got == ["x", None, "hey"]
    got = _reduce(spark, TakeFirstTruthy(elem_type=T.LongType()),
                  [[0, 5], [0], [7, 0]], elem="long")
    assert got == [5, None, 7]


def test_take_all_truthy_spark(spark):
    got = _reduce(spark, TakeAllTruthy(default=[]), [["", "a", None, "b"], ["", None]])
    assert got == [["a", "b"], []]


def test_coalesce_spark(spark):
    got = _reduce(spark, Coalesce(default="none"), [[None, "x"], [None, None]])
    assert got == ["x", "none"]


def test_join_spark(spark):
    got = _reduce(spark, Join(separator=" - "), [["1", "2", "3"]])
    assert got == ["1 - 2 - 3"]
    got = _reduce(spark, Join(), [[1, 2, 3]], elem="long")
    assert got == ["1 2 3"]


def test_flatten_spark(spark):
    got = _reduce(spark, Flatten(), [[["1", "2"], ["3"]]], elem="array<string>")
    assert got == [["1", "2", "3"]]
