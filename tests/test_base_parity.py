"""Framework-core parity (reference tests/test_base.py behaviours):
constructor binding, context precedence, equality/repr, pipeline algebra
immutability."""

import pytest

from scrapy_processors_spark import (
    CharWhitespacePadding,
    MapCompose,
    NormalizeWhitespace,
    StripQuotes,
    TakeFirst,
)
from scrapy_processors_spark.core.base import FunctionOp, Op, as_op


class Dummy(Op):
    a: int = 1
    b: str = "x"

    def process_value(self, value):
        a, b = self.unpack_context()
        return f"{value}-{a}-{b}"


def test_positional_binding_declaration_order():
    # reference ProcessorMeta.__call__ binds *args onto default_context in
    # declaration order (base.py:397-428)
    op = Dummy(5, "y")
    assert op.context == {"a": 5, "b": "y"}
    assert Dummy(5).context == {"a": 5, "b": "x"}
    assert Dummy(b="z").context == {"a": 1, "b": "z"}


def test_too_many_positional_args():
    with pytest.raises(TypeError):
        Dummy(1, 2, 3)


def test_context_precedence_call_over_default():
    op = Dummy(a=2)
    assert op.process_value("v") == "v-2-x"
    assert op.with_context(a=9).process_value("v") == "v-9-x"
    assert op.process_value("v") == "v-2-x"  # original untouched


def test_unpack_context_overrides():
    op = Dummy()
    assert op.unpack_context() == (1, "x")
    assert op.unpack_context(a=7) == (7, "x")


def test_eq_and_str():
    assert Dummy(a=2) == Dummy(a=2)
    assert Dummy(a=2) != Dummy(a=3)
    assert "Dummy" in str(Dummy())
    assert NormalizeWhitespace() == NormalizeWhitespace()
    assert NormalizeWhitespace() != StripQuotes()


def test_pipeline_equality_and_str():
    p1 = MapCompose(str.strip, NormalizeWhitespace())
    p2 = MapCompose(str.strip, NormalizeWhitespace())
    assert p1 == p2
    assert p1 != MapCompose(str.strip)
    assert "MapCompose" in str(p1) and "str.strip" in str(p1)


def test_lambda_str():
    assert str(as_op(lambda x: x)) == "lambda_processor"


def test_pipeline_immutability():
    base = MapCompose(str.strip)
    ext = base + str.upper
    rep = ext.replace(0, str.lower)  # [str.lower, str.upper]
    assert len(base) == 1 and len(ext) == 2 and len(rep) == 2
    assert base.processors != ext.processors
    assert ext.run_python(" a ") == ["A"]
    assert rep.run_python(" A ") == [" A ".lower().upper()] == [" A "]


def test_call_equivalence_forms():
    # reference base.py:257-260: op(v), op([v]), context via kwargs all agree
    sq = StripQuotes()
    v = "'q'"
    assert sq.process_value(v) == "q"
    assert MapCompose(sq).run_python(v) == ["q"]
    assert MapCompose(sq).run_python([v]) == ["q"]


def test_reducer_context_override_at_call():
    tf = TakeFirst()
    assert tf.run_python(["", "a"]) == "a"
    assert tf.run_python(["", "a"], exclude=("a",), default="D") == ""
    # wait: "" not in ("a",) -> returns "" (reference semantics: exclude only)


def test_cwp_positional():
    op = CharWhitespacePadding(("+", "="), 1, 1)
    assert op.context["chars"] == ("+", "=")
    assert op.context["lpad"] == 1 and op.context["rpad"] == 1
