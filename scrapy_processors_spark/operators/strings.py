"""String operators.

Each op keeps the exact reference single-value semantics in
``process_value`` (ground truth, cited per class) and, where the transform is
expressible as a pure Column expression, a SQL-tier ``to_column`` that stays
inside whole-stage codegen.  Kernel-tier ops vectorize with pandas str ops
over Arrow batches.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional, Set, Tuple, Union

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op
from scrapy_processors_spark.core.regex_util import java_regex_chars, py_regex_chars
from scrapy_processors_spark.kernels import emoji_data
from scrapy_processors_spark.kernels.html_text import html_to_text


class UnicodeEscape(Op):
    """Decode escape sequences (``\\n`` -> newline).

    Reference: ``single_value.py:74-118`` — ``value.encode(encoding,
    encoding_errors).decode(decoding, decoding_errors)``.  CPython codec
    behaviour is the spec (including the utf-8 -> unicode_escape mojibake on
    non-ASCII input), so this is kernel-tier by necessity; the kernel is
    pandas-vectorized ``Series.str.encode/.str.decode``.
    """

    encoding: str = "utf-8"
    encoding_errors: str = "backslashreplace"
    decoding: str = "unicode_escape"
    decoding_errors: str = "strict"

    tier = "pandas"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        enc, enc_err, dec, dec_err = self.unpack_context()
        return value.encode(enc, enc_err).decode(dec, dec_err)

    def kernel(self, s: pd.Series) -> pd.Series:
        enc, enc_err, dec, dec_err = self.unpack_context()
        # vectorized codec round-trip (NaN/None propagate as NaN -> null)
        return s.str.encode(enc, errors=enc_err).str.decode(dec, errors=dec_err)


class NormalizeWhitespace(Op):
    """Collapse whitespace + de-space around punctuation.

    Reference: ``single_value.py:121-275`` (4 steps; char sets at :176-237).
    SQL tier: four ``regexp_replace`` + ``trim`` — Java lookarounds match the
    reference's Python patterns; ``(?U)`` makes Java ``\\s`` Unicode-aware to
    match Python's (SURVEY.md §7.2).
    """

    lstrip_chars: Set[str] = {
        ".", ",", "!", "?", ")", "]", "}", ":", ";", "%",
        "’", "”", "\x92", "\x94",
    }
    lstrip_chars_add: Set[str] = set()
    lstrip_chars_ignore: Set[str] = set()

    rstrip_chars: Set[str] = {
        "(", "$", "[", "{", "#", "‘", "“", "\x91", "\x93",
    }
    rstrip_chars_add: Set[str] = set()
    rstrip_chars_ignore: Set[str] = set()

    strip_chars: Set[str] = {"-", "/", "_", "@", "\\", "^", "~"}
    strip_chars_add: Set[str] = set()
    strip_chars_ignore: Set[str] = set()

    tier = "sql"
    output_type = T.StringType()

    def _char_sets(self) -> Tuple[Set[str], Set[str], Set[str]]:
        ctx = self.unpack_context()
        lstrip = set(ctx[0]).union(ctx[1]).difference(ctx[2])
        rstrip = set(ctx[3]).union(ctx[4]).difference(ctx[5])
        strip = set(ctx[6]).union(ctx[7]).difference(ctx[8])
        return lstrip, rstrip, strip

    def process_value(self, value: str) -> str:
        value = re.sub(r"[\u200b\ufeff]", "", value)
        value = re.sub(r"\s+", " ", value)
        lstrip, rstrip, strip = self._char_sets()
        value = re.sub(r"\s*(?=" + py_regex_chars(lstrip) + r")", "", value)
        value = re.sub(r"(?<=" + py_regex_chars(rstrip) + r")\s*", "", value)
        value = re.sub(r"\s*(" + py_regex_chars(strip) + r")\s*", r"\1", value)
        return value.strip()

    def kernel(self, s: pd.Series) -> pd.Series:
        lstrip, rstrip, strip = self._char_sets()
        s = s.str.replace(r"[\u200b\ufeff]", "", regex=True)
        s = s.str.replace(r"\s+", " ", regex=True)
        s = s.str.replace(r"\s*(?=" + py_regex_chars(lstrip) + r")", "", regex=True)
        s = s.str.replace(r"(?<=" + py_regex_chars(rstrip) + r")\s*", "", regex=True)
        s = s.str.replace(r"\s*(" + py_regex_chars(strip) + r")\s*", r"\1", regex=True)
        return s.str.strip()

    def to_column(self, col: Column) -> Column:
        lstrip, rstrip, strip = self._char_sets()
        c = F.regexp_replace(col, "[\u200b\ufeff]", "")
        c = F.regexp_replace(c, r"(?U)\s+", " ")
        c = F.regexp_replace(c, r"(?U)\s*(?=" + java_regex_chars(lstrip) + ")", "")
        c = F.regexp_replace(c, r"(?U)(?<=" + java_regex_chars(rstrip) + r")\s*", "")
        c = F.regexp_replace(c, r"(?U)\s*(" + java_regex_chars(strip) + r")\s*", "$1")
        return F.trim(c)


class CharWhitespacePadding(Op):
    """Pad configured characters with spaces (reference
    ``single_value.py:278-325``)."""

    chars: Union[str, Set[str]] = set()
    lpad: int = 1
    rpad: int = 1

    tier = "sql"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        chars, lpad, rpad = self.unpack_context()
        chars = set(chars)
        if not chars:
            return value
        pattern = py_regex_chars(chars)
        return re.sub(
            r"\s*" + pattern + r"\s*",
            lambda m: " " * lpad + m.group(0).strip() + " " * rpad,
            value,
        )

    def to_column(self, col: Column) -> Column:
        chars, lpad, rpad = self.unpack_context()
        chars = set(chars)
        if not chars:
            return col
        pattern = r"(?U)\s*(" + java_regex_chars(chars) + r")\s*"
        return F.regexp_replace(col, pattern, " " * lpad + "$1" + " " * rpad)


class StripQuotes(Op):
    """Strip runs of leading/trailing quote + tick marks (reference
    ``single_value.py:328-425``)."""

    quotes: Set[str] = {
        "‘", "’", "“", "”",
        "\x27", "\x22", "\x91", "\x92", "\x93", "\x94",
    }
    quotes_add: Set[str] = set()
    quotes_ignore: Set[str] = set()

    ticks: Set[str] = {"`", "ˋ"}
    ticks_add: Set[str] = set()
    ticks_ignore: Set[str] = set()

    symbols_ignore: Set[str] = set()

    tier = "sql"
    output_type = T.StringType()

    def _chars(self) -> Set[str]:
        ctx = self.unpack_context()
        quotes = set(ctx[0]).union(ctx[1]).difference(ctx[2])
        ticks = set(ctx[3]).union(ctx[4]).difference(ctx[5])
        return quotes.union(ticks).difference(set(ctx[6]))

    def process_value(self, value: str) -> str:
        chars = py_regex_chars(self._chars())
        return re.sub(r"^{chars}+|{chars}+$".format(chars=chars), "", value)

    def kernel(self, s: pd.Series) -> pd.Series:
        chars = py_regex_chars(self._chars())
        return s.str.replace(
            r"^{chars}+|{chars}+$".format(chars=chars), "", regex=True
        )

    def to_column(self, col: Column) -> Column:
        chars = java_regex_chars(self._chars())
        return F.regexp_replace(col, f"^{chars}+|{chars}+$", "")


class RemoveHTMLTags(Op):
    """HTML -> text via the stdlib parser kernel (reference
    ``single_value.py:428-462``; parity argument in
    ``kernels/html_text.py``).  Inherently kernel-tier: HTML parsing is not a
    Column expression."""

    tier = "pandas"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        return html_to_text(value)

    def kernel(self, s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else html_to_text(v))


class Demojize(Op):
    """Emoji -> ``:shortcode:`` (reference ``single_value.py:465-509``; table
    provenance in ``kernels/emoji_data.py``).

    ``version``/``handle_version`` follow the emoji lib's public demojize
    semantics: when ``version`` is set, an emoji introduced in a LATER
    Unicode-emoji version is not converted — instead ``handle_version``
    decides its fate: a callable is invoked as ``handle_version(emj, data)``
    (``data`` carries the en shortcode + 'E' version like the lib's
    EMOJI_DATA entry), a string substitutes literally, and None removes the
    emoji.  Version data is the documented subset in
    ``emoji_data.EMOJI_VERSION``.
    """

    delimiters: Tuple[str, str] = (":", ":")
    language: str = "en"
    version: Optional[Union[str, int, float]] = None
    handle_version: Optional[object] = None

    tier = "pandas"
    output_type = T.StringType()

    def _repl(self):
        delims, lang, version, handle_version = self.unpack_context()
        left, right = delims
        table = emoji_data.table_for(lang)
        max_version = None if version is None else float(version)

        def repl(m: "re.Match[str]") -> str:
            emj = m.group(0)
            name = table.get(emj)
            # emoji detected but absent from a non-en subset table stay intact
            if name is None:
                return emj
            if (max_version is not None
                    and emoji_data.version_for(emj) > max_version):
                if callable(handle_version):
                    data = {"en": f":{emoji_data.EMOJI_TO_NAME.get(emj, name)}:",
                            "E": emoji_data.version_for(emj)}
                    if lang != "en":
                        data[lang] = f"{left}{name}{right}"
                    return str(handle_version(emj, data))
                if handle_version is not None:
                    return str(handle_version)
                return ""
            return left + name + right

        return repl

    def process_value(self, value: str) -> str:
        return emoji_data.DEMOJIZE_REGEX.sub(self._repl(), value)

    def kernel(self, s: pd.Series) -> pd.Series:
        return s.str.replace(emoji_data.DEMOJIZE_REGEX, self._repl(), regex=True)


class RemoveEmojis(Op):
    """Delete (or replace) emoji (reference ``single_value.py:512-552``)."""

    replace: str = ""

    tier = "pandas"
    output_type = T.StringType()

    def process_value(self, value: str) -> str:
        (replace,) = self.unpack_context()
        return emoji_data.EMOJI_REGEX.sub(replace, value)

    def kernel(self, s: pd.Series) -> pd.Series:
        (replace,) = self.unpack_context()
        return s.str.replace(emoji_data.EMOJI_REGEX, replace, regex=True)
