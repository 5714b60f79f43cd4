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

# Already-canonical shapes: lowercase scheme+host, no port/userinfo (the
# host charset excludes ':' '@' and uppercase), no fragment, no
# dot-segments; path present.  Query-less vs query variants.
_CANON_NOQ = r"^https?://[a-z0-9.\-]+/([^?#]*[^?#/.])?/?$"
_CANON_Q = r"^https?://[a-z0-9.\-]+/[^?#]*\?[^?#]+$"
# an href that carries its own scheme (RFC 3986: base is ignored)
_HAS_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
# tracking params dropped by _canon_query (vectorized membership test)
_TRACKING_IN_QS = r"(?:^|&)(?:utm_[a-z0-9_]*|fbclid|gclid|ref)="


def _resolve_series(href: pd.Series, base: pd.Series) -> pd.Series:
    """Vectorized RFC-3986 reference resolution for the three common
    reference shapes (absolute, root-relative, path/query-relative).
    Concatenating base-dir + relative path is faithful because
    canonicalization afterwards performs remove_dot_segments — the same
    merge-then-normalize decomposition urljoin uses.  Rows outside
    these shapes (protocol-relative ``//h/p``, empty href) are returned
    unchanged; callers route any non-canonical result to the exact
    pure-Python path."""
    is_abs = href.str.match(_HAS_SCHEME)
    proto_rel = href.str.startswith("//")
    root_rel = ~is_abs & ~proto_rel & href.str.startswith("/")
    query_rel = ~is_abs & href.str.startswith("?")
    path_rel = ~is_abs & ~root_rel & ~query_rel & ~proto_rel & (href != "")
    # urllib quirk: urljoin collapses '//' inside PATH-RELATIVE refs
    # (not root-relative ones); leave such rows to the exact path
    path_rel &= ~href.str.contains("//", regex=False)
    resolved = href.copy()
    if root_rel.any():
        origin = base.str.extract(r"^(https?://[^/?#]+)", expand=False)
        resolved[root_rel] = origin[root_rel] + href[root_rel]
    if query_rel.any() or path_rel.any():
        base_noq = base.str.replace(r"[?#].*$", "", regex=True)
        if query_rel.any():
            resolved[query_rel] = base_noq[query_rel] + href[query_rel]
        if path_rel.any():
            base_dir = base_noq.str.replace(r"[^/]*$", "", regex=True)
            resolved[path_rel] = base_dir[path_rel] + href[path_rel]
    # a null base (shouldn't happen in the engine) -> NaN concat; keep
    # such rows on the exact path rather than poisoning the masks
    return resolved.fillna("")


def _query_is_canonical(resolved: pd.Series) -> pd.Series:
    """True where the query string is already in canonical form: no
    tracking params, no empty params, params sorted.  Sortedness is
    checked column-wise over an expanded split — vectorized string
    compares, no per-row Python."""
    qs = resolved.str.split("?", n=1).str[1].fillna("")
    ok = (
        (qs != "")
        & ~qs.str.contains(_TRACKING_IN_QS, case=False, regex=True)
        & ~qs.str.contains("&&", regex=False)
        & ~qs.str.startswith("&")
        & ~qs.str.endswith("&")
    )
    parts = qs.str.split("&", expand=True)
    for i in range(parts.shape[1] - 1):
        cur, nxt = parts[i], parts[i + 1]
        has_next = nxt.notna()
        ok &= ~has_next | (cur.where(has_next, "") <= nxt.where(has_next, ""))
    return ok


def canonicalize_series(href: pd.Series, base: pd.Series | None = None) -> pd.Series:
    """Vectorized canonicalization of a Series of hrefs.

    Fast path (pandas .str ops, no Python-per-row): resolve the href
    against its base with vectorized concat (:func:`_resolve_series`),
    then accept results already in canonical shape — lowercase http(s)
    scheme+host, no dot-segments / default port / userinfo / fragment,
    query absent or already sorted+tracking-free.  This covers the
    overwhelming majority of crawl-discovered links (including the
    relative hrefs real pages are full of).  Everything else falls back
    to :func:`canonicalize_url` element-wise (still Arrow-batched at
    the Spark boundary).  Unit+property-tested for equality with the
    pure path in tests/test_functions.py.
    """
    href = href.fillna("").str.strip()
    out = pd.Series(pd.NA, index=href.index, dtype="object")

    resolved = _resolve_series(href, base) if base is not None else href
    # non-http(s) SCHEMES are None under canonicalize_url: settle now.
    # Match on the scheme alone (`https?:`), not `https?://` — a
    # same-scheme relative reference without authority ("https:x") is
    # resolved against the base by urljoin, so it must fall through to
    # the exact path, not be settled as non-http.
    non_http = href.str.match(_HAS_SCHEME) & ~href.str.match(
        r"^https?:", case=False
    )
    no_dots = ~resolved.str.contains("/.", regex=False)
    fast = no_dots & resolved.str.match(_CANON_NOQ)
    with_q = no_dots & ~fast & resolved.str.match(_CANON_Q)
    if with_q.any():
        fast |= with_q & _query_is_canonical(resolved)
    fast &= ~non_http
    out[fast] = resolved[fast]

    slow = ~fast & ~non_http
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
