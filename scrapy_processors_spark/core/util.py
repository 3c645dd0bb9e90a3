"""Small shared utilities."""

from __future__ import annotations

from typing import Any, Iterable


def arg_to_iter(arg: Any) -> Iterable[Any]:
    """Same contract as ``itemloaders.utils.arg_to_iter`` (the reference's
    value-wrapping primitive, cf. reference base.py:269):

    - ``None`` -> ``[]``
    - iterables that are not str/bytes/dict -> as-is
    - anything else -> single-element list
    """
    if arg is None:
        return []
    if hasattr(arg, "__iter__") and not isinstance(arg, (str, bytes, dict)):
        return arg
    return [arg]
