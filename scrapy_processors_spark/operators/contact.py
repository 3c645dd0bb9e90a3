"""Contact-info extractors: Emails (SQL tier), PhoneNumbers (kernel tier),
Socials (kernel tier over the stdlib HTML parser).

Reference: ``single_value.py:1017-1197``.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional
from urllib.parse import urlparse

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_processors_spark.core.base import Op
from scrapy_processors_spark.core.util import arg_to_iter
from scrapy_processors_spark.kernels.html_text import extract_hrefs
from scrapy_processors_spark.kernels.phone import PhoneNumberFormat, extract_phone_numbers

_EMAIL_PATTERN = r"[a-z0-9\.\-+_]+@[a-z0-9\.\-+_]+\.[a-z]+"


class Emails(Op):
    """Extract emails, optionally filtered by domain/content (reference
    ``single_value.py:1017-1067``).  List-valued, pure SQL tier."""

    domain: Optional[str] = None
    contains: Optional[str] = None

    tier = "sql"
    is_list_valued = True
    output_type = T.StringType()

    def process_value(self, value: str) -> List[str]:
        domain, contains = self.unpack_context()
        emails = re.findall(_EMAIL_PATTERN, value)
        if domain is not None:
            emails = [e for e in emails if domain == e.split("@")[1]]
        if contains is not None:
            emails = [e for e in emails if contains in e]
        return emails

    def to_column(self, col: Column) -> Column:
        domain, contains = self.unpack_context()
        arr = F.regexp_extract_all(col, F.lit(_EMAIL_PATTERN), F.lit(0))
        if domain is not None:
            arr = F.filter(arr, lambda x: F.substring_index(x, "@", -1) == F.lit(domain))
        if contains is not None:
            arr = F.filter(arr, lambda x: x.contains(contains))
        return arr


class PhoneNumbers(Op):
    """Extract + format phone numbers (reference ``single_value.py:1070-1127``;
    matcher scope in ``kernels/phone.py``).  List-valued kernel tier."""

    region: str = "US"
    num_format: int = PhoneNumberFormat.E164
    leniency: Optional[object] = None
    max_tries: int = 65535

    tier = "pandas"
    is_list_valued = True
    output_type = T.StringType()

    def process_value(self, value: str) -> List[str]:
        region, num_format, leniency, max_tries = self.unpack_context()
        return extract_phone_numbers(value, region, num_format, leniency, max_tries)

    def kernel(self, s: pd.Series) -> pd.Series:
        region, num_format, leniency, max_tries = self.unpack_context()
        return s.map(
            lambda v: None if v is None
            else extract_phone_numbers(v, region, num_format, leniency, max_tries)
        )


class Socials(Op):
    """Group social links by domain (reference ``single_value.py:1130-1197``).

    Input is the page *html string* (our pages table carries html/text
    columns; the reference takes a scrapy Response — same body bytes).
    Output: map<domain, array<url>> with every configured domain present,
    mirroring the reference's defaultdict population loop (:1186-1195).
    """

    domains: List[str] = [
        "facebook.com", "instagram.com", "twitter.com", "linkedin.com",
        "youtube.com", "tiktok.com", "pinterest.com", "reddit.com",
    ]
    additional_domains: Optional[List[str]] = None
    contains: Optional[str] = None

    tier = "pandas"
    output_type = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

    def process_value(self, value: str) -> dict:
        domains, additional_domains, contains = self.unpack_context()
        domains = list(arg_to_iter(domains))
        domains.extend(additional_domains or [])
        links = extract_hrefs(value)
        out = {}
        for domain in domains:
            domain_name = domain.lstrip("www.")  # reference quirk preserved (:1188)
            out[domain_name] = [
                link for link in links
                if domain_name in urlparse(link).netloc
                and (contains is None or contains in link)
            ]
        return out
