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

        def fn(s: pd.Series) -> pd.Series:
            return s.map(lambda v: me.run_python(v if v is not None else []))

        return F.pandas_udf(fn, returnType=ret)(col)

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
