"""URL canonicalization (RFC 3986-derived, public semantics).

Canonical form (documented rules — the frontier's identity function):
1. trim surrounding whitespace,
2. drop the fragment,
3. lowercase scheme and authority (host),
4. drop default ports (``:80`` for http, ``:443`` for https),
5. empty path -> ``/``,
6. strip trailing slashes from non-root paths,
7. uppercase %XX escapes are left as-is (full percent-normalization lives in
   the kernel variant ``canonicalize_url_py`` for exactness when needed).

The Column tier is pure regexp expressions (no ``parse_url`` — keeps the
same regex semantics reproducible in the DuckDB oracle).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonicalize_url(url: Column) -> Column:
    u = F.trim(url)
    u = F.regexp_replace(u, "#.*$", "")                      # drop fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    authority = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?#]*)", 2))
    rest = F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*(.*)$", 2)
    authority = F.regexp_replace(authority, ":80$", "")
    authority = F.regexp_replace(authority, ":443$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    # strip trailing slashes on a non-root path (before any query part)
    rest = F.regexp_replace(rest, r"^(/.+?)/+$", "$1")
    return F.concat(scheme, F.lit("://"), authority, rest)


#: DuckDB-equivalent SQL template; {u} is the url expression.  Kept adjacent
#: to the Column version so the two stay in lockstep.
CANONICALIZE_SQL = (
    "(SELECT lower(regexp_extract(u2, '{scheme}', 1)) || '://' "
    " || regexp_replace(regexp_replace(lower(regexp_extract(u2, '{scheme}([^/?#]*)', 2)), ':80$', ''), ':443$', '') "
    " || regexp_replace(CASE WHEN regexp_extract(u2, '{scheme}[^/?#]*(.*)$', 2) = '' THEN '/' "
    "      ELSE regexp_extract(u2, '{scheme}[^/?#]*(.*)$', 2) END, '^(/.+?)/+$', '\\1') "
    " FROM (SELECT regexp_replace(trim({u}), '#.*$', '') AS u2))"
).replace("{scheme}", "^([A-Za-z][A-Za-z0-9+.\\-]*)://")


def canonicalize_url_py(url: str) -> str:
    """Kernel-exact variant (adds %XX uppercase + unreserved decode)."""
    if url is None:
        return None
    u = url.strip()
    parts = urlsplit(u)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    if scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = parts.path or "/"
    if len(path) > 1:
        path = re.sub(r"/+$", "", path) or "/"

    def fix_pct(m: "re.Match[str]") -> str:
        b = int(m.group(1), 16)
        c = chr(b)
        if c.isalnum() or c in "._~-":
            return c
        return "%" + m.group(1).upper()

    path = re.sub(r"%([0-9a-fA-F]{2})", fix_pct, path)
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE + r"([^/?#:]*)", 2))


def url_path(url: Column) -> Column:
    p = F.regexp_extract(F.trim(url), _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    return F.when(p == "", F.lit("/")).otherwise(p)
