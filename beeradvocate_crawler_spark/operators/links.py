"""URL expressions + pagination expansion — all JVM-side Catalyst
expressions, zero Python (SURVEY.md §2 A3/A4/A6/A16).

The page-type classifier is built from the SAME pattern table the pure
classifier uses (functions/urlnorm.PAGE_TYPE_PATTERNS), so the engine
and the sequential oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.urlnorm import PAGE_PRIORITY, PAGE_TYPE_PATTERNS

PAGINATION_LINK_POS = 100000  # orders generated links after in-page hrefs
REVIEWS_PER_PAGE = 25


def classify_expr(url: Column) -> Column:
    """F.when chain over the shared anchored patterns (A6)."""
    expr = None
    for t, pat in PAGE_TYPE_PATTERNS:
        cond = url.rlike(pat)
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    return expr.otherwise(F.lit("other"))


def priority_expr(page_type: Column) -> Column:
    expr = None
    for t, p in PAGE_PRIORITY.items():
        cond = page_type == t
        expr = F.when(cond, F.lit(p)) if expr is None else expr.when(cond, F.lit(p))
    return expr.otherwise(F.lit(0))


def url_hash_expr(url: Column) -> Column:
    return F.xxhash64(url)  # same bits as functions/xxh64.xxh64_signed


def host_expr(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def path_query_expr(url: Column) -> Column:
    """path + ('?'+query) — the robots match target (A10)."""
    return F.regexp_replace(url, r"^https?://[^/]+", "")


def robots_url_expr(host: Column) -> Column:
    return F.concat(F.lit("https://"), host, F.lit("/robots.txt"))


def pagination_links(parsed, url_col: str = "url", n_ratings_col: str = "n_ratings"):
    """Beer pages expand ?start=25k&view=beer review pages from the
    ratings count — array functions only, no UDF (A16).
    Returns (parent_url, link_url, link_pos) rows."""
    starts = F.when(
        F.col(n_ratings_col) > REVIEWS_PER_PAGE,
        F.sequence(
            F.lit(REVIEWS_PER_PAGE),
            F.col(n_ratings_col) - 1,
            F.lit(REVIEWS_PER_PAGE),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        parsed.filter(F.col("page_type") == "beer")
        .select(F.col(url_col).alias("parent_url"), F.posexplode(starts).alias("k", "start"))
        .select(
            "parent_url",
            F.concat(
                F.col("parent_url"), F.lit("?start="), F.col("start"), F.lit("&view=beer")
            ).alias("link_url"),
            (F.lit(PAGINATION_LINK_POS) + F.col("k")).alias("link_pos"),
        )
    )
