"""URL canonicalization, classification, and priority (SURVEY.md §2 A2/A3/A4/A6).

Single source of truth for *both* the sequential oracle (pure-Python
path) and the Spark engine (vectorized pandas path + JVM expressions).
The differential e2e test (tests/test_e2e_crawl.py) only holds if the
two paths agree byte-for-byte, so the pandas path's fast vectorized
branch is unit-tested against the pure function (tests/test_urlnorm.py).

Canonicalization rules (applied to an absolute or relative href):
  1. resolve relative hrefs against the base URL (RFC 3986 join),
  2. strip the fragment,
  3. lowercase scheme and host,
  4. drop default ports (http:80, https:443),
  5. remove dot-segments from the path,
  6. drop tracking query params (utm_*, fbclid, gclid, ref),
     sort the remaining params lexicographically, re-join,
  7. empty path -> "/".
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

TRACKING_PARAM = re.compile(r"^(utm_[a-z0-9_]*|fbclid|gclid|ref)=", re.I)

# ---------------------------------------------------------------------------
# pure-Python path (oracle + rare-row fallback of the pandas path)
# ---------------------------------------------------------------------------


def _canon_query(query: str) -> str:
    if not query:
        return ""
    parts = [p for p in query.split("&") if p and not TRACKING_PARAM.match(p)]
    parts.sort()
    return "&".join(parts)


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing "/" semantics of "." / ".." final segments
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def canonicalize_url(href: str, base: str | None = None) -> str | None:
    """Canonical absolute URL, or None if not http(s)."""
    href = href.strip()
    if base is not None:
        href = urljoin(base, href)
    try:
        scheme, netloc, path, query, _frag = urlsplit(href)
    except ValueError:
        return None
    scheme = scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = netloc.lower()
    if "@" in netloc:  # userinfo not part of our canonical identity
        netloc = netloc.rsplit("@", 1)[1]
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    if not netloc:
        return None
    path = _remove_dot_segments(path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    return urlunsplit((scheme, netloc, path, _canon_query(query), ""))


def host_of(url: str) -> str:
    return urlsplit(url).netloc


def path_query_of(url: str) -> str:
    """path + ('?'+query if any) — the robots.txt match target."""
    s = urlsplit(url)
    return s.path + (("?" + s.query) if s.query else "")


# ---------------------------------------------------------------------------
# vectorized pandas path (used inside the engine's scalar pandas UDF, A2)
# ---------------------------------------------------------------------------

# Fast-path shape: already-lowercase scheme+host, no port/userinfo (the
# host charset excludes ':' '@' and uppercase), no query, no fragment,
# no dot-segments.  Anything else takes the exact pure-Python path.
_SIMPLE_ABS = r"^https?://[a-z0-9.\-]+(/([^?#]*[^?#/.])?)?/?$"


def canonicalize_series(href: pd.Series, base: pd.Series | None = None) -> pd.Series:
    """Vectorized canonicalization of a Series of hrefs.

    Fast path (pandas .str ops, no Python-per-row): absolute lowercase
    http(s) URLs with no dot-segments, default ports, userinfo, query
    params, or fragments — the overwhelming majority of crawl-discovered
    links.  Everything else falls back to :func:`canonicalize_url`
    element-wise (still Arrow-batched at the Spark boundary).
    Unit-tested for equality with the pure path in tests/test_urlnorm.py.
    """
    href = href.fillna("").str.strip()
    simple = href.str.match(_SIMPLE_ABS) & ~href.str.contains("/.", regex=False)
    out = pd.Series(pd.NA, index=href.index, dtype="object")
    if simple.any():
        fast = href[simple]
        # ensure non-empty path ("https://h" -> "https://h/")
        noslash = ~fast.str.match(r"^https?://[a-z0-9.\-]+/")
        fast = fast.where(~noslash, fast + "/")
        out[simple] = fast
    slow = ~simple
    if slow.any():
        if base is None:
            out[slow] = [canonicalize_url(h) for h in href[slow]]
        else:
            out[slow] = [
                canonicalize_url(h, b) for h, b in zip(href[slow], base[slow])
            ]
    return out


# ---------------------------------------------------------------------------
# page-type classification + priority (A6)
# ---------------------------------------------------------------------------

# Patterns are over the CANONICAL url (query params sorted), host-agnostic.
# One regex list used by both the pure path and the Spark F.when chain —
# the Spark chain is built from these exact pattern strings in
# operators/links.py, so the two classifiers cannot drift.
PAGE_TYPE_PATTERNS: list[tuple[str, str]] = [
    ("robots", r"^https?://[^/]+/robots\.txt$"),
    ("place_dir", r"^https?://[^/]+/place/directory/$"),
    ("place", r"^https?://[^/]+/place/list/\?c_id=\d+(&start=\d+)?$"),
    ("brewery", r"^https?://[^/]+/beer/profile/\d+/$"),
    ("beer", r"^https?://[^/]+/beer/profile/\d+/\d+/$"),
    ("review_page", r"^https?://[^/]+/beer/profile/\d+/\d+/\?start=\d+&view=beer$"),
    ("user", r"^https?://[^/]+/community/members/[a-zA-Z0-9_.\-]+\.\d+/$"),
]

# north rule: brewery > beer > review-pagination; robots above all so a
# host's rules are fetched before its content.
PAGE_PRIORITY: dict[str, int] = {
    "robots": 110,
    "place_dir": 100,
    "place": 90,
    "brewery": 80,
    "beer": 70,
    "review_page": 60,
    "user": 50,
    "other": 0,
}

_COMPILED = [(t, re.compile(p)) for t, p in PAGE_TYPE_PATTERNS]


def classify_url(url: str) -> str:
    for t, rx in _COMPILED:
        if rx.match(url):
            return t
    return "other"


def classify_series(url: pd.Series) -> pd.Series:
    out = pd.Series("other", index=url.index, dtype="object")
    remaining = url.notna()
    for t, p in PAGE_TYPE_PATTERNS:
        m = remaining & url.str.match(p, na=False)
        out[m] = t
        remaining &= ~m
    return out
