"""Pipeline combinators: MapCompose / Compose re-expressed for Spark.

Reference semantics (``/root/reference/scrapy_processors/collections.py``):

- ``MapCompose`` applies each stage to every element, flattens list results,
  drops ``None`` results (collections.py:132-145 + ``arg_to_iter``).
- ``Compose`` folds the whole value list through the stages, with
  ``stop_on_none`` early-exit (collections.py:63-77).
- Both are immutable list-likes: ``+`` / ``extend`` / ``replace`` return new
  instances; ``extend`` raises on conflicting shared context keys
  (reference base.py:896-962, 964-1073).

Spark mapping: a pipeline is *compiled at plan time* into a single Column
expression.  Consecutive SQL-tier stages stay JVM-side (whole-stage codegen);
consecutive pandas-tier stages are fused into ONE Arrow-batched ``pandas_udf``
(not one per op) — the main custom optimization noted in SURVEY.md §4.2.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterable, List, Optional, Sequence

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import FunctionOp, Op, as_op
from scrapy_processors_spark.core.kernel_exec import FlatBatch, run_stages
from scrapy_processors_spark.core.util import arg_to_iter


def _stage_callable(op: Op) -> Callable[[Any], Any]:
    if isinstance(op, FunctionOp):
        return op.func
    if isinstance(op, Pipeline):
        return lambda v, _p=op: _p.run_python(v)
    if hasattr(op, "run_python"):  # whole-list ops (reducers) in a Compose
        return op.run_python
    return op.process_value


class Pipeline:
    """Immutable ordered collection of ops/callables + shared context."""

    # subclass-level pipeline params (e.g. Compose.stop_on_none)
    _pipeline_params: "dict[str, Any]" = {}

    def __init__(self, *processors, **default_context):
        self.processors: List[Any] = list(processors)
        self.default_context = dict(default_context)

    # ---- algebra (reference base.py:964-1073) ------------------------------
    def _clone(self, processors, **context_overrides) -> "Pipeline":
        """New instance with the same context; subclasses with extra pipeline
        params (Compose) override so delegation preserves them."""
        return type(self)(*processors, **{**self.default_context, **context_overrides})

    def __add__(self, processor) -> "Pipeline":
        processors = self.processors.copy()
        if isinstance(processor, Pipeline):
            processors.append(processor)
        else:
            ext = list(processor) if isinstance(processor, (list, tuple)) else [processor]
            processors.extend(ext)
        return self._clone(processors)

    def extend(self, processors) -> "Pipeline":
        if isinstance(processors, Pipeline):
            merged = self._merge_default_context(processors)
            return type(self)(*self.processors, *processors.processors, **merged)
        return self._clone([*self.processors, *processors])

    def replace(self, index: int, processor) -> "Pipeline":
        processors = self.processors.copy()
        processors[index] = processor
        return self._clone(processors)

    def __getattr__(self, name):
        """List-method delegation (reference base.py:1039-1073): unknown
        attributes resolve against the internal processors list; a mutating
        list method (append/insert/pop/remove/clear/...) returns a NEW
        pipeline built from the mutated copy, a non-mutating one (index/
        count/copy/...) returns its own result."""
        if name.startswith("__") and name.endswith("__"):
            # keep pickle/copy/abc protocol probes off the delegation path
            raise AttributeError(name)
        try:
            processors = object.__getattribute__(self, "processors")
        except AttributeError:
            raise AttributeError(name) from None
        if not hasattr(processors, name):
            raise AttributeError(f"'{self}' object has no attribute {name!r}")
        attr = getattr(processors, name)
        if callable(attr):

            @functools.wraps(attr)
            def wrapper(*args, **kwargs):
                copied = processors.copy()
                result = getattr(copied, name)(*args, **kwargs)
                if copied == processors:  # non-mutating method
                    return result
                return self._clone(copied)  # mutating method -> new pipeline

            return wrapper
        return attr

    def _merge_default_context(self, other: "Pipeline") -> dict:
        merged = dict(self.default_context)
        for k, v in other.default_context.items():
            if k in merged and merged[k] != v:
                raise ValueError(
                    f"Conflicting values for context key {k!r} when merging "
                    f"{self} and {other}: {merged[k]!r} != {v!r}"
                )
            merged[k] = v
        return merged

    def with_context(self, **overrides) -> "Pipeline":
        if not overrides:
            return self
        return type(self)(*self.processors, **{**self.default_context, **overrides})

    # ---- resolution --------------------------------------------------------
    def _resolved(self) -> List[Op]:
        """Children as Ops with this pipeline's context pushed down — each
        child only receives the keys it declares (reference base.py:618-629)."""
        out: List[Op] = []
        for p in self.processors:
            op = p if isinstance(p, Pipeline) else as_op(p)
            if isinstance(op, Pipeline):
                sub_ctx = {k: v for k, v in self.default_context.items()}
                out.append(op.with_context(**sub_ctx) if sub_ctx else op)
            else:
                relevant = {
                    k: v for k, v in self.default_context.items() if k in type(op)._params
                }
                out.append(op.with_context(**relevant))
        return out

    # ---- identity ----------------------------------------------------------
    def __str__(self) -> str:
        # mirrors the reference's processor_to_str (base.py:1012-1031)
        def p2s(p) -> str:
            if isinstance(p, (Op, Pipeline)):
                return str(p)
            name = getattr(p, "__qualname__", None) or str(p)
            return "lambda_processor" if "<lambda>" in name else name

        return f"{type(self).__name__}({', '.join(p2s(p) for p in self.processors)})"

    __repr__ = __str__

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.default_context == other.default_context
            and self.processors == other.processors
        )

    def __len__(self):
        return len(self.processors)


def _elem_fn(op: Op):
    # NB: must be a closure, not a default-arg lambda — pyspark's
    # higher-order-function wrapper inspects the lambda arity.
    return lambda x: op.element(x)


def _fused_udf(stages: Sequence[Op], in_array: bool, out_array: bool, name: str):
    elem_type = stages[-1].output_type
    ret_type: T.DataType = T.ArrayType(elem_type) if out_array else elem_type
    struct_out = isinstance(ret_type, T.StructType)

    def _run(s: pd.Series) -> pd.Series:
        batch = (
            FlatBatch.from_list_series(s) if in_array else FlatBatch.from_scalar_series(s)
        )
        run_stages(batch, stages, name)
        return batch.to_list_series() if out_array else batch.to_scalar_series()

    if struct_out:
        fields = [f.name for f in ret_type.fields]

        def fn_struct(s: pd.Series) -> pd.DataFrame:
            # pandas_udf struct return contract: a DataFrame, one column per field
            out = _run(s)
            return pd.DataFrame(
                [(v if isinstance(v, dict) else dict.fromkeys(fields)) for v in out],
                columns=fields,
            )

        return F.pandas_udf(fn_struct, returnType=ret_type)

    def fn(s: pd.Series) -> pd.Series:
        out = _run(s)
        if isinstance(ret_type, T.TimestampType):
            # object-dtype datetimes would reach Arrow as ns and be
            # misread as µs by the JVM; normalize to naive-UTC µs.
            coerced = pd.to_datetime(out, utc=True)
            return coerced.dt.tz_localize(None).astype("datetime64[us]")
        return out

    return F.pandas_udf(fn, returnType=ret_type)


class MapCompose(Pipeline):
    """Per-element stage chain with flattening (the engine's core operator).

    ``apply_scalar(col)``: each row's cell is one value (the overwhelmingly
    common arity-1 case); the result column is scalar unless some stage is
    list-valued.  ``apply_array(col)``: the reference's native shape — the
    cell is a value list (ArrayType), result is ArrayType.
    """

    def __call__(self, col, **overrides) -> Column:
        return self.with_context(**overrides).apply_scalar(
            F.col(col) if isinstance(col, str) else col
        )

    def apply_scalar(self, col: Column) -> Column:
        return self._compile(col, is_array=False)

    def apply_array(self, col: Column) -> Column:
        return self._compile(col, is_array=True)

    def _inline_stages(self) -> List[Op]:
        """Nested MapCompose stages inline losslessly: per-element stage
        application commutes with flattening."""
        flat: List[Op] = []
        for op in self._resolved():
            if isinstance(op, MapCompose):
                flat.extend(op._inline_stages())
            elif isinstance(op, Pipeline):
                # Non-MapCompose nested pipeline (e.g. Compose): a per-element
                # kernel stage.
                flat.append(_ComposeAsStage(op))
            else:
                flat.append(op)
        return flat

    def _compile(self, col: Column, is_array: bool) -> Column:
        stages = self._inline_stages()
        c = col
        i = 0
        while i < len(stages):
            tier = stages[i].tier
            j = i
            while j < len(stages) and stages[j].tier == tier:
                j += 1
            group = stages[i:j]
            if tier == "sql":
                for op in group:
                    if not is_array:
                        c = op.to_column(c)
                        if op.is_list_valued:
                            is_array = True
                    else:
                        c = F.transform(c, _elem_fn(op))
                        if op.is_list_valued:
                            c = F.flatten(c)
                        c = F.filter(c, lambda x: x.isNotNull())
            else:
                out_array = is_array or any(op.is_list_valued for op in group)
                udf = _fused_udf(group, in_array=is_array, out_array=out_array,
                                 name=type(self).__name__)
                c = udf(c)
                is_array = out_array
            i = j
        return c

    # ---- python ground truth (exact reference semantics) -------------------
    def run_python(self, values, **loader_context) -> List[Any]:
        stages = self.with_context(**loader_context)._inline_stages()
        values = list(arg_to_iter(values))
        for stage in stages:
            fn = _stage_callable(stage)
            processed: List[Any] = []
            for value in values:
                try:
                    processed += list(arg_to_iter(fn(value)))
                except Exception as e:  # noqa: BLE001 - provenance wrapper
                    raise ValueError(
                        f"Error in MapCompose with {stage} values={values} "
                        f"error='{type(e).__name__}: {e}'"
                    ) from e
            values = processed
        return values


class _ComposeAsStage(Op):
    """Adapter: a nested non-MapCompose pipeline used as a per-element stage."""

    tier = "pandas"
    is_list_valued = True  # its result list is flattened by the outer MapCompose

    def __init__(self, pipeline: Pipeline):
        super().__init__()
        self.pipeline = pipeline
        self.output_type = getattr(pipeline, "output_type", T.StringType())

    def process_value(self, value):
        return self.pipeline.run_python(value)

    def __str__(self):
        return str(self.pipeline)


class Compose(Pipeline):
    """Whole-list fold (reference collections.py:9-77).

    Spark-side, the row's cell (scalar or array) is the value the fold starts
    from, exactly like the reference's ``values`` list.  Arbitrary Python
    callables are allowed, so this compiles to a single fused pandas kernel
    over rows; pure-SQL usage should prefer MapCompose + reducers.
    """

    stop_on_none: bool = True
    default: Any = None

    def __init__(self, *processors, **default_context):
        self._stop_on_none = default_context.pop("stop_on_none", True)
        self._default = default_context.pop("default", None)
        super().__init__(*processors, **default_context)

    def with_context(self, **overrides) -> "Compose":
        stop = overrides.pop("stop_on_none", self._stop_on_none)
        default = overrides.pop("default", self._default)
        clone = Compose(
            *self.processors,
            stop_on_none=stop,
            default=default,
            **{**self.default_context, **overrides},
        )
        return clone

    def _clone(self, processors, **context_overrides) -> "Compose":
        return Compose(
            *processors,
            stop_on_none=self._stop_on_none,
            default=self._default,
            **{**self.default_context, **context_overrides},
        )

    def __call__(self, col, output_type: Optional[T.DataType] = None, **overrides) -> Column:
        me = self.with_context(**overrides)
        ret = output_type or T.StringType()
        col = F.col(col) if isinstance(col, str) else col

        compiled = me._try_compile_sql(col, output_type)
        if compiled is not None:
            return compiled

        def fn(s: pd.Series) -> pd.Series:
            return s.map(lambda v: me.run_python(v if v is not None else []))

        return F.pandas_udf(fn, returnType=ret)(col)

    def _try_compile_sql(self, col: Column, output_type) -> Optional[Column]:
        """Compile the whole fold to Column expressions when every stage is
        SQL-expressible (reducers' ``to_column``, ``reversed``/``len``
        builtins, scalar sql-tier ops); otherwise None -> the fused pandas
        kernel (VERDICT r02 #5: builtin-only folds must not run per-row
        Python).  A fold-state machine tracks whether the value is still a
        LIST (the reference's ``values``) or already a scalar.  Null input
        cells replicate the Python path's ``run_python([])`` exactly: that
        constant is computed at plan time; if it raises, the kernel path is
        kept so the error surfaces identically at run time."""
        from scrapy_processors_spark.operators.reducers import Reducer

        if not self._stop_on_none:
            # stop_on_none=False lets stages see None mid-fold — a Python
            # error contract Column nulls don't replicate; keep the kernel.
            return None
        c, state = col, "list"
        for op in self._resolved():
            if isinstance(op, FunctionOp):
                fn = op.func
                if fn is reversed and state == "list":
                    c = F.reverse(c)
                elif fn is len:
                    c = F.size(c) if state == "list" else F.length(c)
                    state = "scalar"
                elif state == "scalar" and op.tier == "sql":
                    c = op.to_column(c)
                else:
                    return None
            elif isinstance(op, Reducer):
                if state != "list" or op.tier != "sql":
                    return None
                # a reducer with its own non-null default maps SQL null ->
                # non-null, but the Python fold short-circuits a None value
                # to the COMPOSE default before the reducer runs — not
                # replicable in one expression; keep the kernel there
                own_default = op.context.get(
                    "default", getattr(type(op), "default", None))
                if own_default is not None:
                    return None
                c = op.to_column(c)
                state = "list" if op.list_output else "scalar"
            elif isinstance(op, Op) and op.tier == "sql" and state == "scalar":
                c = op.to_column(c)
                if op.is_list_valued:
                    state = "list"
            else:
                return None
        try:
            empty_result = self.run_python([])
        except Exception:  # noqa: BLE001 - keep kernel so the error replays
            return None
        if empty_result is not None and not isinstance(empty_result, (str, int, float, bool)):
            return None  # non-scalar null-branch literal: keep the kernel
        null_branch = F.lit(empty_result)
        if self._default is not None:
            c = F.coalesce(c, F.lit(self._default))
        out = F.when(col.isNull(), null_branch).otherwise(c)
        # INVARIANT (ADVICE r03): stop_on_none is emulated by letting SQL
        # nulls propagate through the compiled fold to this final when/
        # coalesce — correct only while every op this compiler admits is
        # null-propagating in to_column (no internal coalesce/when that
        # maps null -> non-null).  tests/test_pipeline.py::
        # test_sql_tier_ops_propagate_null enumerates the admitted op
        # classes and asserts to_column(NULL) IS NULL for each.
        # output_type=None matches the kernel path's StringType return
        # (ADVICE r03: the result schema must not depend on which tier
        # happened to compile).
        return out.cast(output_type if output_type is not None else T.StringType())

    def run_python(self, values, **loader_context):
        me = self.with_context(**loader_context) if loader_context else self
        values = list(arg_to_iter(values))
        for stage in me._resolved():
            if values is None and me._stop_on_none:
                return me._default
            fn = _stage_callable(stage)
            try:
                values = fn(values)
            except Exception as e:  # noqa: BLE001
                raise ValueError(
                    f"Error in Compose with {stage} values={values} "
                    f"error='{type(e).__name__}: {e}'"
                ) from e
        if values is None and me._stop_on_none:
            return me._default
        return values

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Compose)
            and self.default_context == other.default_context
            and self.processors == other.processors
            and self._stop_on_none == other._stop_on_none
            and self._default == other._default
        )
