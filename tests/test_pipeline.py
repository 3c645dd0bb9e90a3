"""MapCompose/Compose semantics + pipeline algebra.

Ports reference tests/test_collections.py and the algebra behaviours of
reference base.py:964-1073, then exercises the Spark compilation paths
(SQL-tier runs, fused pandas groups, mixed pipelines, array columns).
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark import (
    Compose,
    ExtractDigits,
    MapCompose,
    NormalizeWhitespace,
    SelectJmes,
    StripQuotes,
    ToFloat,
    UnicodeEscape,
    clean_string,
)
from tests.conftest import run_scalar


# ----------------------------------------------------- reference golden (python)
def test_map_compose_py_golden():
    reverse_upper = MapCompose(lambda x: x[::-1], str.upper)
    lower = MapCompose(str.lower)
    clean = MapCompose(str.strip, str.title)

    assert reverse_upper.run_python("  `Tis but a single value  ") == \
        ["  EULAV ELGNIS A TUB SIT`  "]
    assert lower.run_python("  `Tis but a single value  ") == \
        ["  `tis but a single value  "]
    assert clean.run_python("  `Tis but a single value  ") == \
        ["`Tis But A Single Value"]

    assert reverse_upper.run_python(["hello", "world  "]) == ["OLLEH", "  DLROW"]
    assert clean.run_python(["hello", "world  "]) == ["Hello", "World"]
    assert clean.run_python(["apPlE", "baNAna"]) == ["Apple", "Banana"]


def test_compose_py_golden():
    len_of_last = Compose(lambda x: x[::-1], lambda x: x[0], len)
    filter_world = Compose(lambda x: [v for v in x if v != "world"])

    assert len_of_last.run_python(["hello", "world"]) == 5
    assert filter_world.run_python(["hello", "world"]) == ["hello"]
    assert len_of_last.run_python(["apple", "banana", "cherry", "world", "zucchini"]) == 8
    assert filter_world.run_python(["apple", "banana", "cherry", "world", "zucchini"]) == \
        ["apple", "banana", "cherry", "zucchini"]


def test_map_compose_flattening_and_none_drop():
    # list-valued stage flattens; None results are dropped (collections.py:137)
    mc = MapCompose(ExtractDigits())
    assert mc.run_python(["a 12 b 34", "no digits"]) == ["12", "34"]
    mc2 = MapCompose(lambda v: None if v == "x" else v)
    assert mc2.run_python(["x", "y"]) == ["y"]


def test_map_compose_error_provenance():
    mc = MapCompose(lambda v: v / 0)
    with pytest.raises(ValueError, match="Error in MapCompose"):
        mc.run_python([1])


def test_compose_stop_on_none():
    c = Compose(lambda v: None, len, default="D")
    assert c.run_python([1, 2]) == "D"
    c2 = Compose(lambda v: None, stop_on_none=False)
    assert c2.run_python([1, 2]) is None


# ----------------------------------------------------------------- algebra
def test_pipeline_add_and_replace():
    base = MapCompose(str.strip)
    extended = base + str.upper
    assert len(base) == 1 and len(extended) == 2
    assert extended.run_python(" a ") == ["A"]

    select = MapCompose(SelectJmes("foo"))
    replaced = select.replace(0, SelectJmes("bar"))
    assert replaced.run_python({"bar": "x"}) == ["x"]
    assert select.run_python({"foo": "y"}) == ["y"]


def test_pipeline_extend_context_conflict():
    a = MapCompose(str.strip, k=1)
    b = MapCompose(str.upper, k=2)
    with pytest.raises(ValueError, match="Conflicting"):
        a.extend(b)
    merged = a.extend(MapCompose(str.upper, k=1))
    assert len(merged) == 2


def test_pipeline_list_method_delegation():
    """__getattr__ list delegation (reference base.py:1039-1073 +
    tests/test_base.py::test__getattr__): mutating list methods return a NEW
    pipeline, non-mutating ones return their own result."""
    base = MapCompose(str.strip, str.upper)

    cleared = base.clear()
    assert len(base) == 2 and len(cleared) == 0
    assert isinstance(cleared, MapCompose)

    appended = base.append(str.lower)
    assert len(base) == 2 and len(appended) == 3
    assert appended.run_python(" A ") == ["a"]

    inserted = base.insert(0, str.title)
    assert inserted.processors[0] is str.title and len(inserted) == 3

    removed = appended.remove(str.lower)
    assert removed == base

    popped = base.pop()  # mutating -> new pipeline, pop's return discarded
    assert isinstance(popped, MapCompose) and len(popped) == 1

    reversed_p = base.reverse()
    assert reversed_p.processors == [str.upper, str.strip]

    # non-mutating methods pass through their result
    assert base.index(str.upper) == 1
    assert base.count(str.strip) == 1
    assert base.copy() == [str.strip, str.upper]

    with pytest.raises(AttributeError):
        base.not_a_list_method()

    # context (incl. Compose pipeline params) survives delegation
    ctx = MapCompose(str.strip, k=1).append(str.upper)
    assert ctx.default_context == {"k": 1}
    comp = Compose(sum, stop_on_none=False, default=-1).append(str)
    assert comp._stop_on_none is False and comp._default == -1
    assert len(comp) == 2


def test_pipeline_context_pushdown():
    # pipeline-level kwargs reach only ops that declare the key
    mc = MapCompose(StripQuotes(), NormalizeWhitespace(), lstrip_chars_ignore=".")
    assert mc.run_python(["This is a sentence  .  "]) == ["This is a sentence ."]


# -------------------------------------------------------------- spark paths
def test_clean_string_pipeline_spark(spark):
    # mixed pandas (UnicodeEscape) + sql (trim/quotes/whitespace) pipeline
    inp = '  "" This Really    \\n\\n\\n\\n is a         \\t\\t\\t\\t            messy string  !!!   "'
    got = run_scalar(spark, lambda c: clean_string.apply_scalar(c), [inp])
    assert got == [clean_string.run_python(inp)[0]]
    assert got == ["This Really is a messy string!!!"]
    # + str.capitalize = the integration golden (cleaned_data.json "text")
    pipe = clean_string + str.capitalize
    got2 = run_scalar(spark, pipe.apply_scalar, [inp])
    assert got2 == ["This really is a messy string!!!"]


def test_sql_only_pipeline_spark(spark):
    mc = MapCompose(str.strip, StripQuotes(), NormalizeWhitespace())
    got = run_scalar(spark, mc.apply_scalar, ['  "A  B !"  '])
    assert got == ["A B!"]


def test_list_valued_stage_spark(spark):
    mc = MapCompose(NormalizeWhitespace(), ExtractDigits())
    got = run_scalar(spark, mc.apply_scalar, ["num 1,000.12 and 77", "none here"])
    assert got == [["1,000.12", "77"], []]


def test_mixed_tier_list_stage_spark(spark):
    # sql list stage then pandas stage applied per element
    mc = MapCompose(ExtractDigits(), ToFloat())
    got = run_scalar(spark, mc.apply_scalar, ["a 12 b 3,400"])
    assert got == [[12.0, 3400.0]]


def test_array_input_spark(spark):
    df = spark.createDataFrame([(0, ["  a ", " b  "])], "id long, v array<string>")
    mc = MapCompose(str.strip, str.upper)
    out = df.select(mc.apply_array(F.col("v")).alias("r")).collect()
    assert out[0]["r"] == ["A", "B"]


def test_fused_kernel_group_is_single_udf(spark):
    # two pandas stages fuse: plan contains exactly one ArrowEvalPython node
    mc = MapCompose(UnicodeEscape(), UnicodeEscape())
    df = spark.createDataFrame([("a\\nb",)], "v string")
    plan = df.select(mc.apply_scalar(F.col("v")).alias("r"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_spark_error_provenance(spark):
    # kernel-stage failures surface with the reference's provenance format
    mc = MapCompose(UnicodeEscape(decoding_errors="strict"),
                    lambda v: (_ for _ in ()).throw(RuntimeError("boom")))
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(Exception, match="Error in MapCompose"):
        df.select(mc.apply_scalar(F.col("v")).alias("r")).collect()


def test_url_canonicalize_op(spark):
    from scrapy_processors_spark import UrlCanonicalize

    got = run_scalar(spark, UrlCanonicalize(), ["HTTP://A.B:80/x/#f"])
    assert got == ["http://a.b/x"]
    assert UrlCanonicalize().process_value("HTTP://A.B:80/x/#f") == "http://a.b/x"


def test_array_input_kernel_stage_spark(spark):
    # pandas-tier stage over an ArrayType column (FlatBatch list path)
    df = spark.createDataFrame(
        [(0, ["a\\tb", "c\\nd"]), (1, []), (2, None)], "id long, v array<string>")
    mc = MapCompose(UnicodeEscape())
    out = {r["id"]: r["r"] for r in
           df.select("id", mc.apply_array(F.col("v")).alias("r")).collect()}
    assert out[0] == ["a\tb", "c\nd"]
    assert out[1] == []
    assert out[2] == []


def test_array_input_list_valued_kernel_spark(spark):
    from scrapy_processors_spark import PhoneNumbers

    df = spark.createDataFrame(
        [(0, ["call 816.360.3390 now", "+1 650-253-0000 here", "nothing"])],
        "id long, v array<string>")
    mc = MapCompose(PhoneNumbers())
    out = df.select(mc.apply_array(F.col("v")).alias("r")).collect()[0]["r"]
    assert out == ["+18163603390", "+16502530000"]


def test_compose_sql_tier_values_and_plan(spark):
    """Builtin/reducer-only Compose folds compile to pure Column expressions
    (VERDICT r02 #5): values match run_python exactly AND the plan carries no
    Python eval node."""
    from scrapy_processors_spark import Compose, TakeFirst

    comp = Compose(reversed, TakeFirst(exclude=()), len)
    rows = [(0, ["ab", "cde", "f"]), (1, ["x"]), (2, []), (3, None),
            (4, ["", "yy"]), (5, ["one", ""])]
    df = spark.createDataFrame(rows, "id long, v array<string>")
    out = df.select("id", comp(F.col("v"), output_type=T.LongType()).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    got = {r["id"]: r["r"] for r in out.collect()}
    for vid, v in rows:
        expected = comp.run_python(v if v is not None else [])
        assert got[vid] == expected, (vid, got[vid], expected)


def test_compose_opaque_stage_keeps_kernel(spark):
    """A lambda stage is not SQL-expressible: the fold must still run (via
    the fused kernel) and match run_python."""
    from scrapy_processors_spark import Compose

    comp = Compose(lambda x: x[::-1], lambda x: x[0] if x else None)
    df = spark.createDataFrame([(0, ["a", "b"]), (1, [])], "id long, v array<string>")
    out = df.select("id", comp(F.col("v")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan
    got = {r["id"]: r["r"] for r in out.collect()}
    assert got[0] == "b" and got[1] is None


def test_compose_sql_tier_respects_compose_default(spark):
    from scrapy_processors_spark import Compose, TakeFirst

    comp = Compose(TakeFirst(exclude=()), default="empty")
    df = spark.createDataFrame([(0, ["a"]), (1, [])], "id long, v array<string>")
    out = df.select("id", comp(F.col("v")).alias("r"))
    assert "EvalPython" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["id"]: r["r"] for r in out.collect()}
    assert got[0] == "a" and got[1] == "empty"


def test_sql_tier_ops_propagate_null(spark):
    """ADVICE r03: Compose's SQL tier emulates stop_on_none by letting nulls
    propagate through the compiled fold to the final when/coalesce.  That is
    only sound while every op the compiler can admit is null-propagating:
    ``to_column(NULL) IS NULL``.  Enumerate every sql-tier Op subclass (at
    its default construction, the form the compiler admits) and assert it —
    a future op with an internal coalesce/when trips this test, not a silent
    run_python divergence."""
    import importlib
    import inspect

    from scrapy_processors_spark.core.base import Op
    from scrapy_processors_spark.operators.reducers import Reducer

    mods = ["strings", "numeric", "datetime_ops", "contact", "misc",
            "reducers", "url"]
    # ops whose context has no usable default construction
    ctor_kwargs = {"JsonGet": {"expression": "k"}, "GetAttr": {"attr": "f"}}
    # ops reading a non-string scalar (null struct for field access)
    input_col = {"GetAttr": "st"}
    reducer_input_col = {"Flatten": "aa"}  # needs array<array<...>>
    ops = []
    for m in mods:
        mod = importlib.import_module(f"scrapy_processors_spark.operators.{m}")
        for cls in vars(mod).values():
            if (inspect.isclass(cls) and issubclass(cls, Op)
                    and cls.__module__ == mod.__name__
                    and getattr(cls, "tier", None) == "sql"
                    # abstract bases (Reducer) keep Op's kernel-delegating
                    # to_column; the compiler only sees concrete subclasses
                    and cls.to_column is not Op.to_column):
                ops.append(cls(**ctor_kwargs.get(cls.__name__, {})))
    assert len(ops) >= 15, [str(o) for o in ops]

    df = spark.createDataFrame(
        [(1,)], "id long").select(
        "id",
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("array<string>").alias("a"),
        F.lit(None).cast("struct<f:string>").alias("st"),
        F.lit(None).cast("array<array<string>>").alias("aa"))
    checks = []
    for op in ops:
        if isinstance(op, Reducer):
            own_default = op.context.get(
                "default", getattr(type(op), "default", None))
            if own_default is not None:
                continue  # the compiler rejects these (pipeline.py:398-401)
            rcol = F.col(reducer_input_col.get(type(op).__name__, "a"))
            checks.append((type(op).__name__, op.to_column(rcol)))
        else:
            col = F.col(input_col.get(type(op).__name__, "s"))
            checks.append((type(op).__name__, op.to_column(col)))
    row = df.select(
        *[c.isNull().alias(f"n{i}") for i, (_, c) in enumerate(checks)]
    ).collect()[0]
    bad = [name for i, (name, _) in enumerate(checks) if not row[f"n{i}"]]
    assert not bad, f"sql-tier ops mapping NULL -> non-NULL: {bad}"
