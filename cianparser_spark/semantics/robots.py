"""Minimal robots.txt semantics shared by the engine and the oracle.

Scope (documented): only ``User-agent: *`` groups, only ``Disallow``
prefix rules, matched against the URL's path plus query string — the
subset the north rule's gating needs.  No reference analog exists
(the reference fetches without consulting robots.txt at all); these
semantics are OURS and are applied identically by the sequential
simulator and the distributed engine so bit-match tests stay valid.

Crawl policy for blocked URLs:
* blocked LIST page  → never fetched, no retry, recorded (dead table
  kind='robots-list' in the engine / ``robots_blocked`` in the sim);
* blocked DETAIL page → the offer is emitted from its card fields
  without detail enrichment (graceful degradation, not data loss).
"""

from __future__ import annotations

from urllib.parse import urlparse


def parse_robots(text: str) -> tuple[str, ...]:
    """Disallow prefixes for User-agent: * (empty Disallow = allow all)."""
    rules: list[str] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            rules.append(val)
    return tuple(rules)


def path_qs(url: str) -> str:
    u = urlparse(url)
    return u.path + (f"?{u.query}" if u.query else "")


def is_allowed(url: str, rules: tuple[str, ...]) -> bool:
    if not rules:
        return True
    p = path_qs(url)
    return not any(p.startswith(r) for r in rules)
