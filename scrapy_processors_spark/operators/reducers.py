"""List reducers (output processors).

Reference: ``/root/reference/scrapy_processors/multi_values.py``.  These
collapse a field's value *list* into the field value.  Spark-side they are
pure Column expressions over ArrayType columns — ``F.filter`` +
``F.element_at`` / ``F.array_join`` / ``F.flatten`` — so they run entirely
inside whole-stage codegen, no Python.

``run_python`` keeps the exact reference per-list semantics (including the
type+str-repr truthiness matching of ``multi_values.py:22-57``) as the parity
ground truth; the Column tier encodes the per-column-type specialization of
those rules (a typed Spark column statically fixes most ``isinstance``
dispatch — SURVEY.md §7.2).
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction
from typing import Any, Iterable, List, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op
from scrapy_processors_spark.core.util import arg_to_iter

#: Reference ``multi_values.py:11-19``.
FALSEY_VALUES: Tuple[Any, ...] = (None, False, 0, 0.0, 0j, Decimal(0), Fraction(0, 1))

_NO_EXCLUDE = "Don't exclude any falsey values"


def is_truthy(
    value: Any,
    falsey_values: Tuple[Any, ...] = FALSEY_VALUES,
    empty_iterables_are_falsey: bool = True,
    *exclude: Any,
) -> bool:
    """Exact reference semantics (``multi_values.py:22-57``)."""
    for falsey_value in exclude:
        if isinstance(value, type(falsey_value)) and str(value) == str(falsey_value):
            return True

    if (
        empty_iterables_are_falsey
        and hasattr(value, "__iter__")
        and hasattr(value, "__len__")
        and len(value) == 0
    ):
        return False

    for falsey_value in falsey_values:
        if isinstance(value, type(falsey_value)) and str(value) == str(falsey_value):
            return False

    return True


def _lit_if_compatible(value: Any, elem_type: T.DataType) -> Optional[Column]:
    """Literal for comparisons against elements of ``elem_type``; None when
    the Python value can never equal an element of that type (the static
    residue of the reference's isinstance dispatch)."""
    if value is None:
        return None
    if isinstance(elem_type, T.StringType):
        return F.lit(value) if isinstance(value, str) else None
    if isinstance(elem_type, T.BooleanType):
        return F.lit(value) if isinstance(value, bool) else None
    if isinstance(elem_type, (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                              T.FloatType, T.DoubleType, T.DecimalType)):
        if isinstance(value, bool) or not isinstance(value, (int, float, Decimal)):
            return None
        return F.lit(value)
    return None


def truthy_predicate(
    x: Column,
    elem_type: T.DataType,
    falsey_values: Tuple[Any, ...] = FALSEY_VALUES,
    empty_iterables_are_falsey: bool = True,
    exclude: Iterable[Any] = (),
) -> Column:
    """Column predicate: per-type specialization of ``is_truthy``."""
    excl = [lit for v in exclude if (lit := _lit_if_compatible(v, elem_type)) is not None]
    excluded = None
    for lit in excl:
        cond = x == lit
        excluded = cond if excluded is None else (excluded | cond)

    falsey = x.isNull()  # None is always in the falsey domain
    if empty_iterables_are_falsey and isinstance(elem_type, T.StringType):
        falsey = falsey | (F.length(x) == 0)
    if empty_iterables_are_falsey and isinstance(elem_type, (T.ArrayType, T.MapType)):
        falsey = falsey | (F.size(x) == 0)
    for v in falsey_values:
        lit = _lit_if_compatible(v, elem_type)
        if lit is not None:
            falsey = falsey | (x == lit)

    truthy = ~falsey
    if excluded is not None:
        truthy = excluded | truthy
    return truthy


class Reducer(Op):
    """Base for array -> value reducers; ``elem_type`` parameterizes the
    static type specialization of predicates."""

    tier = "sql"
    #: True when the reduction yields a LIST (Compose SQL-tier state tracking)
    list_output = False

    def element_type(self) -> T.DataType:
        return self.context.get("elem_type", T.StringType())


class TakeAll(Reducer):
    """Identity passthrough (reference ``multi_values.py:60-102``)."""

    list_output = True

    elem_type: T.DataType = T.StringType()

    def to_column(self, col: Column) -> Column:
        return col

    def run_python(self, values: Any) -> Any:
        return values


Identity = TakeAll


class TakeAllTruthy(Reducer):
    """Keep truthy values; default when none (reference
    ``multi_values.py:104-161``)."""

    list_output = True

    falsey_values: Tuple[Any, ...] = FALSEY_VALUES
    empty_iterables_are_falsey: bool = True
    exclude: Any = _NO_EXCLUDE
    default: Any = None
    elem_type: T.DataType = T.StringType()

    def to_column(self, col: Column) -> Column:
        falsey, empty_f, exclude, default, elem_type = self.unpack_context()
        exclude = () if exclude == _NO_EXCLUDE else tuple(exclude)
        filtered = F.filter(
            col, lambda x: truthy_predicate(x, elem_type, tuple(falsey), empty_f, exclude)
        )
        default_col = (
            F.lit(None).cast(T.ArrayType(elem_type)) if default is None
            else F.array(*[F.lit(v) for v in default]).cast(T.ArrayType(elem_type))
            if isinstance(default, (list, tuple))
            else F.lit(default)
        )
        return F.when(F.size(filtered) == 0, default_col).otherwise(filtered)

    def run_python(self, values: Iterable[Any], **ctx) -> Any:
        falsey, empty_f, exclude, default, _ = self.unpack_context(**ctx)
        exclude = () if exclude == _NO_EXCLUDE else tuple(exclude)
        values = arg_to_iter(values)
        truthy = [v for v in values if is_truthy(v, tuple(falsey), empty_f, *exclude)]
        return truthy if truthy else default


class TakeFirst(Reducer):
    """First value not in ``exclude`` (reference ``multi_values.py:164-192``)."""

    exclude: Tuple[Any, ...] = (None, "")
    default: Any = None
    elem_type: T.DataType = T.StringType()

    def to_column(self, col: Column) -> Column:
        exclude, default, elem_type = self.unpack_context()
        exclude_null = any(v is None for v in exclude)
        lits = [lit for v in exclude if (lit := _lit_if_compatible(v, elem_type)) is not None]

        def keep(x: Column) -> Column:
            cond = F.lit(True)
            if exclude_null:
                cond = cond & x.isNotNull()
            for lit in lits:
                # null-safe: x != lit is null for null x; handled above
                cond = cond & (x.isNull() | (x != lit))
            return cond

        if not exclude_null and not lits:
            first = F.get(col, 0)  # no exclusions: skip the (interpreted) filter
        else:
            first = F.get(F.filter(col, keep), 0)  # ANSI-safe on empty arrays
        if default is None:
            return first
        return F.coalesce(first, F.lit(default))

    def run_python(self, values: Iterable[Any], **ctx) -> Any:
        exclude, default, _ = self.unpack_context(**ctx)
        for value in arg_to_iter(values):
            if value not in exclude:
                return value
        return default


class TakeFirstTruthy(Reducer):
    """First truthy value (reference ``multi_values.py:195-239``)."""

    falsey_values: Tuple[Any, ...] = FALSEY_VALUES
    empty_iterables_are_falsey: bool = True
    exclude: Any = _NO_EXCLUDE
    default: Any = None
    elem_type: T.DataType = T.StringType()

    def to_column(self, col: Column) -> Column:
        falsey, empty_f, exclude, default, elem_type = self.unpack_context()
        exclude = () if exclude == _NO_EXCLUDE else tuple(exclude)
        first = F.get(
            F.filter(col, lambda x: truthy_predicate(x, elem_type, tuple(falsey), empty_f, exclude)),
            0,
        )  # ANSI-safe on empty arrays
        if default is None:
            return first
        return F.coalesce(first, F.lit(default))

    def run_python(self, values: Iterable[Any], **ctx) -> Any:
        falsey, empty_f, exclude, default, _ = self.unpack_context(**ctx)
        exclude = () if exclude == _NO_EXCLUDE else tuple(exclude)
        for value in arg_to_iter(values):
            if is_truthy(value, tuple(falsey), empty_f, *exclude):
                return value
        return default


class Coalesce(Reducer):
    """First non-None value (reference ``multi_values.py:242-269``)."""

    default: Any = None
    elem_type: T.DataType = T.StringType()

    def to_column(self, col: Column) -> Column:
        default, _ = self.unpack_context()
        first = F.get(F.filter(col, lambda x: x.isNotNull()), 0)
        if default is None:
            return first
        return F.coalesce(first, F.lit(default))

    def run_python(self, values: Iterable[Any], **ctx) -> Any:
        default, _ = self.unpack_context(**ctx)
        for value in arg_to_iter(values):
            if value is not None:
                return value
        return default


class Join(Reducer):
    """``separator.join(str(v) for v in values)`` (reference
    ``multi_values.py:272-295``).  Column tier uses cast-to-string; note the
    documented divergence ``str(True)='True'`` vs Spark ``'true'`` — the
    Python ground truth is exact."""

    separator: str = " "

    def to_column(self, col: Column) -> Column:
        (separator,) = self.unpack_context()
        return F.array_join(
            F.transform(col, lambda x: x.cast(T.StringType())),
            separator,
            null_replacement="None",
        )

    def run_python(self, values: Iterable[Any], **ctx) -> str:
        (separator,) = self.unpack_context(**ctx)
        return separator.join([str(v) for v in arg_to_iter(values)])


class Flatten(Reducer):
    """Recursively flatten (reference ``multi_values.py:298-310``).  Column
    arrays have a static nesting depth, so recursion unrolls at plan time via
    ``depth``."""

    list_output = True

    depth: int = 1

    def to_column(self, col: Column) -> Column:
        (depth,) = self.unpack_context()
        c = col
        for _ in range(depth):
            c = F.flatten(c)
        return c

    def run_python(self, values: Any) -> List[Any]:
        # scrapy.utils.python.flatten semantics
        out: List[Any] = []
        for v in values:
            if hasattr(v, "__iter__") and not isinstance(v, (str, bytes, dict)):
                out.extend(self.run_python(v))
            else:
                out.append(v)
        return out
