"""Raw robots.txt parsing: Spark window-relational tier vs the Python
ground truth, over bodies exercising every subset rule (frontier/robots.py
docstring scope)."""

import pytest

from scrapy_processors_spark.frontier.robots import parse_robots, parse_robots_py

BODIES = {
    "plain": "User-agent: *\nDisallow: /private\nDisallow: /tmp\n",
    "star_after_other": (
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /a\n"
    ),
    "consecutive_group": (
        "User-agent: googlebot\nUser-agent: *\nDisallow: /shared\n"
    ),
    "no_star": "User-agent: googlebot\nDisallow: /only-g\n",
    "comments_and_blanks": (
        "# robots\n\nUser-agent: *  # all\n"
        "Disallow: /x  # comment\n\nDisallow:\nDisallow: /y\n"
    ),
    "two_star_groups": (
        "User-agent: *\nDisallow: /one\n\n"
        "User-agent: bing\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /two\n"
    ),
    "case_insensitive_fields": "USER-AGENT: *\nDISALLOW: /Upper\n",
    "empty": "",
    "rules_before_any_group": "Disallow: /orphan\nUser-agent: *\nDisallow: /ok\n",
    # ADVICE r02: a non-UA field line between two UA runs must END the first
    # group — '*' gets no rules here (the Allow line breaks the UA run, so
    # 'b' starts a NEW group owning /z)
    "allow_splits_groups": "User-agent: *\nAllow: /x\nUser-agent: b\nDisallow: /z\n",
    "crawl_delay_between": "User-agent: a\nCrawl-delay: 5\nUser-agent: *\nDisallow: /w\n",
    "sitemap_then_star": "Sitemap: http://x/s.xml\nUser-agent: *\nDisallow: /m\n",
    "space_before_colon": "User-agent : *\nDisallow : /s\n",
    # ADVICE r03: CRLF line endings (the common case for real robots.txt) —
    # F.trim strips 0x20 only, so '*\r' failed the `agent == "*"` match and
    # the SQL tier silently returned [] while the Python tier parsed rules
    "crlf": "User-agent: *\r\nDisallow: /c\r\nDisallow: /d\r\n",
    "crlf_mixed_tabs": "User-agent:\t*\r\nDisallow:\t/t\r\n",
}

EXPECTED = {
    "plain": ["/private", "/tmp"],
    "star_after_other": ["/a"],
    "consecutive_group": ["/shared"],
    "no_star": [],
    "comments_and_blanks": ["/x", "/y"],
    "two_star_groups": ["/one", "/two"],
    "case_insensitive_fields": ["/Upper"],
    "empty": [],
    "rules_before_any_group": ["/ok"],
    "allow_splits_groups": [],
    "crawl_delay_between": ["/w"],
    "sitemap_then_star": ["/m"],
    "space_before_colon": ["/s"],
    "crlf": ["/c", "/d"],
    "crlf_mixed_tabs": ["/t"],
}


@pytest.mark.parametrize("name", sorted(BODIES))
def test_parse_robots_py(name):
    assert parse_robots_py(BODIES[name]) == EXPECTED[name]


def test_parse_robots_spark_matches_py(spark):
    raw = spark.createDataFrame(
        [(k, v) for k, v in BODIES.items()], "host string, robots_txt string")
    got = {r["host"]: list(r["disallow_prefixes"])
           for r in parse_robots(raw).collect()}
    for name in BODIES:
        assert got.get(name, []) == EXPECTED[name], name
