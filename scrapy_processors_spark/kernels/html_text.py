"""From-scratch HTML → text extraction kernel.

Replicates ``BeautifulSoup(value, "html.parser").get_text()`` (reference
``single_value.py:428-462``) without bs4: BeautifulSoup's "html.parser"
builder *is* the stdlib ``html.parser.HTMLParser``, and ``get_text()``
concatenates exactly the parser's ``handle_data`` events with
``convert_charrefs=True`` (entities decoded, comments/doctype excluded,
script/style contents included as text).  Subclassing the same stdlib parser
therefore reproduces the reference byte-for-byte — this is the
``pages.html -> text`` invariant of BASELINE.json:input_hint.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: List[str] = []

    def handle_data(self, data: str) -> None:
        self.chunks.append(data)


class _LinkExtractor(HTMLParser):
    """Collects ``<a href="...">`` values (reference Socials link scan,
    single_value.py:1182-1183: ``soup.find_all("a", href=True)``)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: List[str] = []

    def handle_starttag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.links.append(value)
                    break


def html_to_text(value: str) -> str:
    p = _TextExtractor()
    p.feed(value)
    p.close()
    return "".join(p.chunks)


def extract_hrefs(value: str) -> List[str]:
    p = _LinkExtractor()
    p.feed(value)
    p.close()
    return p.links
