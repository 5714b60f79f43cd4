"""robots.txt parsing + most-specific-rule matching (SURVEY.md §2 A10).

Semantics (RFC 9309 subset, deterministic):
- only the ``User-agent: *`` group applies (the engine advertises no
  specific agent);
- ``Allow`` / ``Disallow`` rules match against ``path + ('?' + query
  if query)``; a rule is a literal prefix unless it uses the RFC 9309
  special characters — ``*`` matches any span of characters and a
  TRAILING ``$`` anchors the match at end-of-path (a ``$`` anywhere
  else is literal, per RFC 9309 §2.2.3);
- the most specific rule wins = longest rule pattern in octets (the
  reference matcher convention); on equal length Allow wins;
- no matching rule, or empty Disallow value -> allowed;
- ``Crawl-delay`` in the * group sets the host's politeness delay
  (seconds of *logical* round time, SURVEY.md §4.2).

Used by: the sequential oracle (pure path), the engine's robots parse
(pandas UDF over fetched robots bodies), and the engine's relational
allow/deny join (rules as rows, longest-prefix via a ranking window).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_CRAWL_DELAY = 1.0

# compiled wildcard-rule regexes, keyed by rule text; rules tables are
# tiny (robots files cap at ~500 KiB per RFC 9309) so this never grows
# meaningfully
_RX_CACHE: dict[str, re.Pattern] = {}


def rule_matches(rule: str, path_query: str) -> bool:
    """RFC 9309 rule match: literal prefix unless the rule uses ``*``
    (any span) or a trailing ``$`` (end anchor).  The relational twin
    is operators/politeness.py::rule_match_expr — the two are
    differential-tested over the same rule/path grid."""
    if "*" not in rule and not rule.endswith("$"):
        return path_query.startswith(rule)
    rx = _RX_CACHE.get(rule)
    if rx is None:
        anchored = rule.endswith("$")
        body = rule[:-1] if anchored else rule
        pat = ".*".join(re.escape(part) for part in body.split("*"))
        rx = _RX_CACHE[rule] = re.compile(pat + (r"\Z" if anchored else ""))
    return rx.match(path_query) is not None


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
            if prefix and rule_matches(prefix, path_query):
                plen = len(prefix)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: str, agent: str | None = None) -> RobotsRules:
    """Parse a robots.txt body with RFC 9309 group semantics.

    Groups: a run of adjacent ``User-agent:`` lines opens one group
    whose members are ALL the run's tokens (a ``User-agent`` line
    after rules starts a new group).  Selection (RFC 9309 §2.2.1):
    when ``agent`` is given and any group names it (case-insensitive
    product-token match), the rules of ALL such groups are combined
    and the ``*`` groups do NOT apply; otherwise the combined ``*``
    groups apply; a body with neither is allow-all.  ``Crawl-delay``
    is taken from the selected groups (last wins); ``Sitemap:`` is a
    global directive collected from the whole file."""
    # each group: (agents set, [(allow, rule)], crawl_delay | None)
    groups: list[tuple[set[str], list[tuple[bool, str]], float | None]] = []
    sitemaps: list[str] = []
    open_agents: set[str] | None = None  # a UA run still accepting tokens
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            tok = val.lower()
            if open_agents is None:
                open_agents = {tok}
                groups.append((open_agents, [], None))
            else:
                open_agents.add(tok)
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
        elif key in ("allow", "disallow", "crawl-delay"):
            open_agents = None  # next UA line starts a new group
            if not groups:
                continue  # rules before any User-agent line: no group
            agents, rules, delay = groups[-1]
            if key == "crawl-delay":
                try:
                    groups[-1] = (agents, rules, float(val))
                except ValueError:
                    pass
            elif val:  # empty Disallow == allow everything; skip the rule
                rules.append((key == "allow", val))

    want = (agent or "").lower()
    selected = [g for g in groups if want and want in g[0]]
    if not selected:
        selected = [g for g in groups if "*" in g[0]]
        if not selected:
            return RobotsRules([], DEFAULT_CRAWL_DELAY, sitemaps)
    out: list[tuple[int, bool, str]] = []
    crawl_delay = DEFAULT_CRAWL_DELAY
    for _agents, rules, delay in selected:
        for allow, rule in rules:
            out.append((len(out), allow, rule))
        if delay is not None:
            crawl_delay = delay
    return RobotsRules(out, crawl_delay, sitemaps)
