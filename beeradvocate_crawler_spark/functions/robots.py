"""robots.txt parsing + longest-prefix matching (SURVEY.md §2 A10).

Semantics (subset of urllib.robotparser, deterministic):
- only the ``User-agent: *`` group applies (the engine advertises no
  specific agent);
- ``Allow`` / ``Disallow`` rules are raw path(+query) prefixes — the
  match target for URL u is ``path + ('?' + query if query)``;
- the longest matching prefix wins; on equal length Allow wins;
- no matching rule, or empty Disallow value -> allowed;
- ``Crawl-delay`` in the * group sets the host's politeness delay
  (seconds of *logical* round time, SURVEY.md §4.2).

Used by: the sequential oracle (pure path), the engine's robots parse
(pandas UDF over fetched robots bodies), and the engine's relational
allow/deny join (rules as rows, longest-prefix via a ranking window).
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_CRAWL_DELAY = 1.0


@dataclass
class RobotsRules:
    # (rule_ord, allow, prefix); prefix "" never matches (empty Disallow)
    rules: list[tuple[int, bool, str]] = field(default_factory=list)
    crawl_delay: float = DEFAULT_CRAWL_DELAY
    # ``Sitemap:`` is a GLOBAL directive (robotstxt.org) — collected
    # from the whole file regardless of user-agent group; feeds A21
    sitemaps: list[str] = field(default_factory=list)

    def allowed(self, path_query: str) -> bool:
        best_len = -1
        best_allow = True
        for _ord, allow, prefix in self.rules:
            if prefix and path_query.startswith(prefix):
                plen = len(prefix)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: str) -> RobotsRules:
    """Parse a robots.txt body; returns the ``User-agent: *`` group's
    rules (allow-all if the group is absent or the body is empty)."""
    rules: list[tuple[int, bool, str]] = []
    crawl_delay = DEFAULT_CRAWL_DELAY
    sitemaps: list[str] = []
    in_star = False
    seen_star_group = False
    ord_ = 0
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star = val == "*"
            seen_star_group = seen_star_group or in_star
        elif in_star and key in ("allow", "disallow"):
            if val:  # empty Disallow == allow everything; skip the rule
                rules.append((ord_, key == "allow", val))
                ord_ += 1
        elif in_star and key == "crawl-delay":
            try:
                crawl_delay = float(val)
            except ValueError:
                pass
        elif key == "sitemap" and val:
            sitemaps.append(val)
    if not seen_star_group:
        return RobotsRules([], DEFAULT_CRAWL_DELAY, sitemaps)
    return RobotsRules(rules, crawl_delay, sitemaps)
