"""Regex character-class builders for both engines.

``py_regex_chars`` mirrors the reference helper ``regex_chars``
(``/root/reference/scrapy_processors/single_value.py:44-71``) for the Python
kernels.  ``java_regex_chars`` emits the same class for Java's Pattern
(Spark's ``regexp_replace``/``regexp_extract_all``), escaping every
non-alphanumeric codepoint as ``\\uXXXX`` so Latin-1 control-range quotes
(\\x91-\\x94) and Unicode punctuation survive unambiguously (SURVEY.md §7.2).

Patterns that rely on ``\\s`` matching Unicode whitespace must carry the
``(?U)`` (UNICODE_CHARACTER_CLASS) inline flag on the Java side — Python
``re`` is Unicode-aware by default, Java is not.
"""

from __future__ import annotations

import re
from typing import Iterable, Union

from scrapy_processors_spark.core.util import arg_to_iter


def py_regex_chars(chars: Union[str, Iterable[str]], escape: bool = True) -> str:
    cs = list(arg_to_iter(chars))
    cs = [re.escape(c) if escape else c for c in cs]
    return "[{}]".format("".join(cs))


def java_escape_char(c: str) -> str:
    cp = ord(c)
    if ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9"):
        return c
    if cp <= 0xFFFF:
        return "\\u%04X" % cp
    return "\\x{%X}" % cp


def java_regex_chars(chars: Union[str, Iterable[str]]) -> str:
    return "[{}]".format("".join(java_escape_char(c) for c in sorted(arg_to_iter(chars))))
