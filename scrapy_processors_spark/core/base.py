"""Operator builder core.

Re-expresses the reference's Processor/context machinery
(``/root/reference/scrapy_processors/base.py``) as *plan-time builders* for
PySpark Column expressions and vectorized pandas kernels:

- Reference ``ProcessorMeta`` harvests class attributes into ``default_context``
  and binds constructor ``*args`` positionally in declaration order
  (base.py:125-176, base.py:397-428).  :class:`Op` does the same via
  ``__init_subclass__`` + ``__init__``.
- Reference ``ChainMap(loader_context, default_context)`` precedence
  (base.py:265-274) becomes plain dict-merge at *plan build* time: calling an
  op with keyword overrides clones it with merged context, and the merged
  values become literals inside the Column expression / closed-over constants
  of the pandas kernel.  No per-row context resolution exists at runtime.
- Reference ``Processor.__call__``'s per-value Python loop (base.py:782-783)
  becomes either a pure Column expression (``to_column``, SQL tier — Catalyst
  optimizes, whole-stage codegen applies) or an Arrow-batched pandas kernel
  (``kernel``, PUDF tier) fused with neighbouring kernels by the pipeline
  layer.  There is no row-at-a-time Python UDF anywhere.

``process_value`` keeps the exact reference single-value semantics and is the
ground truth that both tiers are tested against.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_param(name: str, value: Any) -> bool:
    """Class attributes that become default context (cf. reference
    ``MetaMixin.__new__``, base.py:125-176): public, non-callable,
    non-descriptor, non-dunder."""
    if name.startswith("_"):
        return False
    if name in ("output_type", "is_list_valued", "tier", "list_output"):
        return False
    if inspect.isfunction(value) or inspect.ismethod(value):
        return False
    if isinstance(value, (classmethod, staticmethod, property)):
        return False
    return True


class Op:
    """Base operator builder.

    Subclasses declare parameters as class attributes (= the reference's
    ``default_context``).  Constructing an instance binds positional args in
    declaration order and keyword args by name, mirroring
    ``ProcessorMeta.__call__`` (reference base.py:397-428).

    Spark surface:
      - ``op(col)`` / ``op(col, **overrides)`` -> Column (scalar application)
      - ``op.element(col)`` -> Column usable inside ``F.transform`` lambdas
    Python surface (ground truth + kernel tier):
      - ``op.process_value(v)`` exact reference semantics per value
      - ``op.kernel(series)`` vectorized over a pandas Series
    """

    # Spark type of a single output element (not array-wrapped).
    output_type: T.DataType = T.StringType()
    # True when one input element produces a *list* of output elements
    # (e.g. ExtractDigits) — MapCompose flattens those (collections.py:137).
    is_list_valued: bool = False
    # 'sql' when to_column is a pure Column expression; 'pandas' otherwise.
    tier: str = "pandas"

    _params: "dict[str, Any]" = {}

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        params = dict(getattr(cls, "_params", {}))
        for name, value in vars(cls).items():
            if _is_param(name, value):
                params[name] = value
        cls._params = params

    def __init__(self, *args, **kwargs):
        names = list(type(self)._params)
        if len(args) > len(names):
            raise TypeError(
                f"{type(self).__name__} takes at most {len(names)} positional "
                f"arguments ({len(args)} given)"
            )
        ctx = dict(type(self)._params)
        for name, value in zip(names, args):
            ctx[name] = value
        for name, value in kwargs.items():
            if name in ctx and name in dict(zip(names, args)):
                raise TypeError(
                    f"{type(self).__name__} got multiple values for argument {name!r}"
                )
            ctx[name] = value
        self.context = ctx

    # ---- context -----------------------------------------------------------
    def unpack_context(self, **overrides) -> tuple:
        """Values of declared params in declaration order, with overrides
        applied (reference ``ContextMixin.unpack_context``, base.py:569-616)."""
        merged = {**self.context, **overrides}
        return tuple(merged[name] for name in type(self)._params)

    def with_context(self, **overrides) -> "Op":
        if not overrides:
            return self
        clone = type(self).__new__(type(self))
        clone.context = {**self.context, **overrides}
        return clone

    def as_kernel(self) -> "Op":
        """Clone pinned to the pandas-kernel tier (for SQL-tier ops whose
        Column translation can't express a particular context)."""
        clone = type(self).__new__(type(self))
        clone.context = dict(self.context)
        clone.tier = "pandas"
        return clone

    # ---- spark surface -----------------------------------------------------
    def __call__(self, col, **overrides) -> Column:
        op = self.with_context(**overrides)
        return op.to_column(F.col(col) if isinstance(col, str) else col)

    def to_column(self, col: Column) -> Column:
        """Scalar application.  SQL-tier ops override this with a pure Column
        expression; the default routes through a single-stage fused kernel."""
        from scrapy_processors_spark.core.pipeline import MapCompose

        return MapCompose(self).apply_scalar(col)

    def element(self, col: Column) -> Column:
        """Element expression for use inside ``F.transform`` over arrays.
        Only valid for SQL-tier ops (pure expressions)."""
        if self.tier != "sql":
            raise TypeError(f"{self} is not expressible as a per-element Column")
        return self.to_column(col)

    # ---- python surface ----------------------------------------------------
    def process_value(self, value: Any) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def kernel(self, s: pd.Series) -> pd.Series:
        """Vectorized kernel over a pandas Series.  Default maps
        ``process_value``; subclasses override with pandas-native str ops
        where a true vectorization exists."""
        return s.map(lambda v: None if v is None else self.process_value(v))

    # ---- identity ----------------------------------------------------------
    def __str__(self) -> str:
        ctx = ", ".join(f"{k}={v!r}" for k, v in self.context.items())
        return f"{type(self).__name__}({ctx})"

    __repr__ = __str__

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self.context == other.context

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(map(str, self.context.items())))))


class FunctionOp(Op):
    """Adapter wrapping a plain Python callable as a pipeline stage, the way
    the reference accepts ``str.strip`` / ``json.loads`` / lambdas as
    first-class processors (README/whats-a-processor.md:38-56).

    Known callables additionally get a SQL-tier Column mapping so they stay
    JVM-side (``str.strip`` -> F.trim etc.); unknown callables run in the
    fused pandas kernel.
    """

    def __init__(self, func: Callable, column_fn: Optional[Callable] = None,
                 output_type: T.DataType = T.StringType(),
                 is_list_valued: bool = False):
        super().__init__()
        self.func = func
        self.column_fn = column_fn
        self.output_type = output_type
        self.is_list_valued = is_list_valued
        if column_fn is not None:
            self.tier = "sql"

    def to_column(self, col: Column) -> Column:
        if self.column_fn is not None:
            return self.column_fn(col)
        return super().to_column(col)

    def process_value(self, value: Any) -> Any:
        return self.func(value)

    def __str__(self) -> str:
        name = getattr(self.func, "__qualname__", None) or str(self.func)
        if "<lambda>" in name:
            name = "lambda_processor"
        return name

    __repr__ = __str__

    def __eq__(self, other) -> bool:
        return isinstance(other, FunctionOp) and self.func == other.func

    def __hash__(self):
        return hash(self.func)


#: Registry mapping well-known plain-Python processors to SQL-tier columns.
#: ``str.title`` is deliberately PUDF-tier: Python title-case differs from
#: ``F.initcap`` on apostrophes/digits (SURVEY.md §7.2).  ``str.strip`` maps
#: to a Unicode-whitespace regexp trim — ``F.trim`` only strips ASCII spaces.
_KNOWN_CALLABLES: "dict[Any, Callable[[Column], Column]]" = {
    str.strip: lambda c: F.regexp_replace(c, r"(?U)^\s+|\s+$", ""),
    str.lower: lambda c: F.lower(c),
    str.upper: lambda c: F.upper(c),
}


def as_op(processor: Any) -> Op:
    """Coerce a pipeline member (Op or plain callable) into an Op."""
    if isinstance(processor, Op):
        return processor
    if callable(processor):
        return FunctionOp(processor, _KNOWN_CALLABLES.get(processor))
    raise TypeError(f"not a processor: {processor!r}")
