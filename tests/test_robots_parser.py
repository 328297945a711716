"""robots.txt parsing parity (N4): the kernel must agree with stdlib
urllib.robotparser — the reference's parser (utils/robots_parser.py) —
on the prefix-deny subset, and refuse loudly outside it."""

from __future__ import annotations

import urllib.robotparser

import pytest

from crawlspark.robots import parse_robots_txt, robots_from_pages

SIMPLE = """\
User-agent: *
Disallow: /private/
Disallow: /admin/
Crawl-delay: 3
"""

AGENTED = """\
User-agent: douban-bot
Disallow: /only-for-bot/

User-agent: *
Disallow: /private/
"""

WILDCARD = """\
User-agent: *
Disallow: /cgi/*.cgi
"""

ALLOWY = """\
User-agent: *
Disallow: /private/
Allow: /private/ok/
"""


def test_parse_simple_matches_stdlib_verdicts():
    prefixes, delay = parse_robots_txt(SIMPLE)
    assert prefixes == ["/private/", "/admin/"]
    assert delay == 3.0
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(SIMPLE.splitlines())
    for path, want in [("/private/x", False), ("/admin/", False),
                       ("/public/x", True), ("/", True)]:
        ours = not any(path.startswith(p) for p in prefixes)
        assert ours == rp.can_fetch("*", f"http://h.com{path}") == want


def test_agent_specific_entry_selected():
    prefixes, _ = parse_robots_txt(AGENTED, user_agent="douban-bot")
    assert prefixes == ["/only-for-bot/"]
    prefixes, _ = parse_robots_txt(AGENTED, user_agent="otherbot")
    assert prefixes == ["/private/"]


def test_strict_rejects_unsupported_subset():
    with pytest.raises(ValueError):
        parse_robots_txt(WILDCARD)
    with pytest.raises(ValueError):
        parse_robots_txt(ALLOWY)
    # non-strict keeps the plain prefixes
    prefixes, _ = parse_robots_txt(ALLOWY, strict=False)
    assert prefixes == ["/private/"]
    prefixes, _ = parse_robots_txt(WILDCARD, strict=False)
    assert prefixes == ["/cgi/"]


def test_robots_from_pages_spark(spark):
    """End-to-end: robots.txt pages in the corpus -> ROBOTS table usable
    by the scheduler; hosts without robots.txt get no row (default-allow)."""
    rows = [
        ("http://a.com/robots.txt", None, SIMPLE.encode(), "", "en"),
        ("http://b.com/robots.txt", None, b"User-agent: *\nDisallow: /x/\n", "", "en"),
        ("http://a.com/page", None, b"<html></html>", "", "en"),
    ]
    from crawlspark.schema import PAGES

    pages = spark.createDataFrame(rows, schema=PAGES)
    got = {r["host"]: r for r in robots_from_pages(pages).collect()}
    assert set(got) == {"a.com", "b.com"}
    assert got["a.com"]["deny_prefixes"] == ["/private/", "/admin/"]
    assert got["a.com"]["crawl_delay"] == 3.0
    assert got["b.com"]["deny_prefixes"] == ["/x/"]
    assert got["b.com"]["crawl_delay"] is None

    # the derived table drops straight into the admission join
    from crawlspark.scheduler import CrawlConfig, pop_slice
    from crawlspark.schema import FRONTIER

    fr = spark.createDataFrame(
        [("f1", "http://a.com/private/p", "a.com", 0, 1, 0, 1, "queued", 0, 0, 1),
         ("f2", "http://a.com/ok", "a.com", 0, 1, 0, 2, "queued", 0, 0, 1)],
        schema=FRONTIER,
    )
    sliced, denied = pop_slice(fr, robots_from_pages(pages), CrawlConfig(), 1.0)
    assert {r["url"] for r in denied.collect()} == {"http://a.com/private/p"}
    assert {r["url"] for r in sliced.collect()} == {"http://a.com/ok"}
