"""functions/robots.py — RFC 9309 wildcard/anchor rule translation.

The example battery mirrors RFC 9309 §2.2.3's matching table and the
Google robots.txt documentation's wildcard examples; matching is
checked with Python's fnmatch-equivalent of SQL LIKE so the unit tests
pin the TRANSLATION, independent of any engine.
"""

from __future__ import annotations

import re

import pytest

from luxo_rs_spark.functions.robots import compile_rules, robots_rule_to_like


def _like_match(pattern: str, s: str) -> bool:
    """Reference SQL-LIKE matcher: % = any run, everything else literal
    (our patterns contain no _ or escapes by construction)."""
    rx = "".join(".*" if c == "%" else re.escape(c) for c in pattern)
    return re.fullmatch(rx, s) is not None


def _rule_matches(rule: str, path: str) -> bool:
    like, _spec = robots_rule_to_like(rule)
    return _like_match(like, path)


# (rule, path, should_match) — RFC 9309 §2.2.3 "Matching of the URI"
# examples plus the Google robots.txt spec's path-matching table.
RFC_CASES = [
    # plain prefix rules
    ("/", "/", True),
    ("/", "/anything", True),
    ("/fish", "/fish", True),
    ("/fish", "/fish.html", True),
    ("/fish", "/fish/salmon.html", True),
    ("/fish", "/fishheads", True),
    ("/fish", "/Fish.asp", False),  # case-sensitive
    ("/fish", "/catfish", False),  # anchored at start
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish", False),
    ("/fish/", "/fish/salmon.htm", True),
    # '*' wildcard
    ("/fish*", "/fish", True),
    ("/fish*", "/fishheads/yummy.html", True),
    ("/fish*", "/catfish", False),
    ("/*.php", "/index.php", True),
    ("/*.php", "/filename.php", True),
    ("/*.php", "/folder/filename.php", True),
    ("/*.php", "/folder/filename.php?parameters", True),
    ("/*.php", "/folder/any.php.file.html", True),
    ("/*.php", "/filename.php/", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    # '$' end anchor
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php/", False),
    ("/*.php$", "/filename.php5", False),
    ("/*.php$", "/windows.PHP", False),
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
    # mid-pattern wildcard runs and literal '$'
    ("/a**b", "/ab", True),
    ("/a**b", "/axyzb", True),
    ("/a$b", "/a$b", True),
    ("/a$b", "/ab", False),
]


@pytest.mark.parametrize(("rule", "path", "want"), RFC_CASES)
def test_rfc9309_matching(rule, path, want):
    assert _rule_matches(rule, path) is want, (rule, path)


def test_translation_shapes():
    assert robots_rule_to_like("/docs/private") == ("/docs/private%", 13)
    assert robots_rule_to_like("/*.php$") == ("/%.php", 7)
    assert robots_rule_to_like("/fish*.html$") == ("/fish%.html", 12)
    # trailing '*' then implicit prefix '%' collapse to one '%'
    assert robots_rule_to_like("/pub*") == ("/pub%", 5)
    # lone '*' rule
    assert robots_rule_to_like("*") == ("%", 1)


def test_specificity_is_raw_octet_length():
    # the RFC's longest-match key counts the RULE text, wildcards and
    # anchor included — NOT the translated pattern
    _, spec_anchored = robots_rule_to_like("/p$")
    _, spec_plain = robots_rule_to_like("/p")
    assert spec_anchored == 3 and spec_plain == 2


def test_rejections():
    with pytest.raises(ValueError):
        robots_rule_to_like("")
    with pytest.raises(ValueError):
        robots_rule_to_like("$")
    for bad in ("/a%b", "/a_b", "/a\\b"):
        with pytest.raises(NotImplementedError):
            robots_rule_to_like(bad)


def test_compile_rules_rows():
    rows = compile_rules(
        [("*", "disallow", "/site/*.php$"), ("h1", "allow", "/pub*")]
    )
    assert rows == [
        ("*", "disallow", "/site/%.php", 12),
        ("h1", "allow", "/pub%", 5),
    ]


# ---------------------------------------------------------------------------
# parse_robots_txt — RFC 9309 group semantics
# ---------------------------------------------------------------------------

from luxo_rs_spark.functions.robots import parse_robots_txt

ROBOTS = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: examplebot   # product token, case-insensitive
User-agent: otherbot
Disallow: /only-for-example/

User-agent: ExampleBot
Allow: /merged-group/

User-agent: emptybot
Disallow:

Sitemap: https://x.example.com/sitemap.xml
Crawl-delay: 10
"""


def test_parse_star_group():
    assert parse_robots_txt(ROBOTS, "*") == [
        ("disallow", "/private/"),
        ("allow", "/private/ok"),
    ]


def test_parse_named_group_case_insensitive_and_merged():
    # two groups name examplebot (different case) -> merged per §2.2.1
    got = parse_robots_txt(ROBOTS, "ExampleBot")
    assert got == [
        ("disallow", "/only-for-example/"),
        ("allow", "/merged-group/"),
    ]
    # a multi-UA group's rules apply to every named token
    assert parse_robots_txt(ROBOTS, "otherbot") == [
        ("disallow", "/only-for-example/")
    ]


def test_parse_unknown_agent_falls_back_to_star():
    assert parse_robots_txt(ROBOTS, "nobody") == [
        ("disallow", "/private/"),
        ("allow", "/private/ok"),
    ]


def test_parse_empty_disallow_is_noop():
    assert parse_robots_txt(ROBOTS, "emptybot") == []


def test_parse_rule_before_any_group_ignored():
    txt = "Disallow: /early\nUser-agent: *\nDisallow: /late"
    assert parse_robots_txt(txt, "*") == [("disallow", "/late")]


def test_parse_blank_lines_do_not_close_group():
    txt = "User-agent: *\n\n# comment\nDisallow: /a\n\nAllow: /a/b\n"
    assert parse_robots_txt(txt, "*") == [
        ("disallow", "/a"),
        ("allow", "/a/b"),
    ]


def test_parse_feeds_compile_rules():
    rows = compile_rules(
        [("h", v, p) for v, p in parse_robots_txt(ROBOTS, "*")]
    )
    assert rows == [
        ("h", "disallow", "/private/%", 9),
        ("h", "allow", "/private/ok%", 11),
    ]
