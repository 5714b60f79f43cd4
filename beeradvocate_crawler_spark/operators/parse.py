"""HTML -> (text, links, records) in ONE vectorized Python pass
(SURVEY.md §2 A15/A5; §3.1 stage 6 — JVM->Python boundary #2).

``parse_fetched`` runs as a single ``mapInPandas`` over the fetch-join
output so the fat ``html`` column crosses the Arrow boundary exactly
once.  Inside, everything is pandas ``.str`` ops over the SAME
compiled regexes the sequential oracle uses
(functions/parse_fields.py) — the SURVEY §7.4 byte-exactness
mitigation.  Typed record payloads come back as JSON strings and are
re-typed JVM-side with ``from_json`` (codegen'd), so no nested-struct
Arrow shuttling is needed.

Output schema (one row per fetched URL):
    url, page_type, fetch_status, text,
    link_urls array<string>, link_pos array<int>,   -- canonical, aligned
    n_ratings int, record_json string, crawl_delay double
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import parse_fields as pf
from ..functions.robots import parse_robots
from ..functions.textextract import html_to_text_series
from ..functions.urlnorm import canonicalize_series

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_type", T.StringType()),
        T.StructField("fetch_status", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("link_urls", T.ArrayType(T.StringType())),
        T.StructField("link_pos", T.ArrayType(T.IntegerType())),
        T.StructField("n_ratings", T.IntegerType()),
        T.StructField("record_json", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)

BREWERY_JSON_SCHEMA = (
    "brewery_id long, name string, place string, nbr_beers int, url string"
)
BEER_JSON_SCHEMA = (
    "beer_id long, brewery_id long, name string, brewery_name string, "
    "style string, abv double, n_ratings int, url string"
)
REVIEWS_JSON_SCHEMA = (
    "reviews array<struct<beer_id: long, user: string, user_id: long, "
    "score: double, look: double, smell: double, taste: double, feel: double, "
    "overall: double, date: string, text: string, url: string>>"
)
USER_JSON_SCHEMA = "user string, user_id long, url string"


def _dumps(obj) -> str:
    # numpy int64 is not a python-int subclass; float64 is fine
    return json.dumps(obj, default=lambda o: o.item())


def _extract_links(html: pd.Series, url: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized href extraction + canonicalization; returns two
    Series of aligned lists (urls, positions)."""
    empty_u = pd.Series([[] for _ in range(len(html))], index=html.index)
    empty_p = pd.Series([[] for _ in range(len(html))], index=html.index)
    if html.empty:
        return empty_u, empty_p
    flat = html.str.extractall(pf.RX_HREF)  # MultiIndex (row, match) -> href
    if flat.empty:
        return empty_u, empty_p
    hrefs = flat[0]
    base = url.reindex(hrefs.index.get_level_values(0))
    base.index = hrefs.index
    canon = canonicalize_series(hrefs, base)
    keep = canon.notna()
    canon = canon[keep]
    pos = canon.index.get_level_values(1).astype("int64")
    g = pd.DataFrame(
        {"u": canon.values, "p": pos, "row": canon.index.get_level_values(0)}
    ).groupby("row")
    link_urls = g["u"].agg(list)
    link_pos = g["p"].agg(list)
    return (
        link_urls.reindex(html.index).apply(lambda v: v if isinstance(v, list) else []),
        link_pos.reindex(html.index).apply(lambda v: v if isinstance(v, list) else []),
    )


def _json_esc(s: pd.Series) -> pd.Series:
    """Vectorized JSON string escaping — full \\x00-\\x1f range, exactly
    the set json.dumps escapes.  Leaving any control char raw would
    make from_json silently null the record (rows vanish, no error)."""
    out = (
        s.str.replace("\\", "\\\\", regex=False)
        .str.replace('"', '\\"', regex=False)
        .str.replace("\n", "\\n", regex=False)
        .str.replace("\r", "\\r", regex=False)
        .str.replace("\t", "\\t", regex=False)
    )
    # rare residue (\x00-\x08, \x0b, \x0c, \x0e-\x1f) -> \u00XX; the
    # contains() pre-test keeps the per-row callable off the hot path
    rest = out.str.contains(_CTRL_RX, regex=True, na=False)
    if rest.any():
        out[rest] = out[rest].str.replace(
            _CTRL_RX, lambda m: "\\u%04x" % ord(m.group()), regex=True
        )
    return out


_CTRL_RX = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def _reviews_arr(html: pd.Series, url: pd.Series) -> pd.Series:
    """Per-page JSON array string ``[{review},...]`` via one extractall.
    Fragments are assembled with vectorized string concat (no per-row
    json.dumps — this is the parse hot path at 40k review pages/round);
    float/int ``astype(str)`` uses shortest-repr, so ``from_json``
    round-trips to identical doubles."""
    out = pd.Series(["[]"] * len(html), index=html.index)
    if html.empty:
        return out
    rv = html.str.extractall(pf.RX_REVIEW)
    if rv.empty:
        return out
    rv.columns = [
        "score", "look", "smell", "taste", "feel",
        "overall", "user", "user_id", "date", "text",
    ]
    date_s = (
        pd.to_datetime(rv["date"], format=pf.RX_DATE).dt.strftime("%Y-%m-%d %H:%M:%S")
    )
    rows = rv.index.get_level_values(0)
    url_s = url.reindex(rows)
    url_s.index = rv.index
    beer_id_s = url_s.str.extract(pf.RX_BEER_IDS)[1]
    frag = (
        '{"beer_id":' + beer_id_s
        + ',"user":"' + _json_esc(rv["user"])
        + '","user_id":' + rv["user_id"]
        + ',"score":' + rv["score"].astype(float).astype(str)
        + ',"look":' + rv["look"].astype(float).astype(str)
        + ',"smell":' + rv["smell"].astype(float).astype(str)
        + ',"taste":' + rv["taste"].astype(float).astype(str)
        + ',"feel":' + rv["feel"].astype(float).astype(str)
        + ',"overall":' + rv["overall"].astype(float).astype(str)
        + ',"date":"' + date_s
        + '","text":"' + _json_esc(rv["text"])
        + '","url":"' + _json_esc(url_s) + '"}'
    )
    grouped = "[" + frag.groupby(level=0).agg(",".join) + "]"
    out.update(grouped)
    return out


def _parse_batch(pdf: pd.DataFrame, agent: str | None = None) -> pd.DataFrame:
    n = len(pdf)
    url = pdf["url"]
    html_b = pdf["html"]
    ok = html_b.notna()
    html = pd.Series(pd.NA, index=pdf.index, dtype="object")
    if ok.any():
        html[ok] = html_b[ok].str.decode("utf-8")
    out = pd.DataFrame(
        {
            "url": url,
            "page_type": pdf["page_type"],
            "fetch_status": ok.map({True: 200, False: 404}).astype("int32"),
            "text": pd.Series(pd.NA, index=pdf.index, dtype="object"),
            "link_urls": pd.Series([[] for _ in range(n)], index=pdf.index),
            "link_pos": pd.Series([[] for _ in range(n)], index=pdf.index),
            "n_ratings": pd.Series(pd.NA, index=pdf.index, dtype="Int32"),
            "record_json": pd.Series(pd.NA, index=pdf.index, dtype="object"),
            "crawl_delay": pd.Series(pd.NA, index=pdf.index, dtype="Float64"),
        }
    )
    pt = pdf["page_type"]

    # robots: rules JSON + crawl delay; text is the raw body (passthrough)
    m = ok & (pt == "robots")
    if m.any():
        bodies = html[m]
        # tiny cardinality: one per host; agent selects the RFC 9309 group
        rules = bodies.map(lambda b: parse_robots(b, agent))
        out.loc[m, "text"] = bodies
        out.loc[m, "record_json"] = rules.map(
            lambda r: _dumps(
                {"rules": [{"ord": o, "allow": a, "prefix": p} for o, a, p in r.rules]}
            )
        )
        out.loc[m, "crawl_delay"] = rules.map(lambda r: r.crawl_delay).astype(float)

    # entity pages: text + links, vectorized once over all types
    ent = ok & (pt != "robots")
    if ent.any():
        out.loc[ent, "text"] = html_to_text_series(html[ent])
        lu, lp = _extract_links(html[ent], url[ent])
        out.loc[ent, "link_urls"] = lu
        out.loc[ent, "link_pos"] = lp

    m = ok & (pt == "brewery")
    if m.any():
        h = html[m]
        rec = pd.DataFrame(
            {
                "brewery_id": url[m].str.extract(pf.RX_BREWERY_ID)[0].astype("int64"),
                "name": h.str.extract(pf.RX_BREWERY_NAME)[0],
                "place": h.str.extract(pf.RX_BREWERY_PLACE)[0],
                "nbr_beers": h.str.extract(pf.RX_BREWERY_NBEERS)[0].astype(int),
                "url": url[m],
            }
        )
        out.loc[m, "record_json"] = pd.Series(
            [_dumps(r) for r in rec.to_dict("records")], index=rec.index
        )

    m = ok & ((pt == "beer") | (pt == "review_page"))
    if m.any():
        h = html[m]
        nr = h.str.extract(pf.RX_BEER_RATINGS)[0].astype(int)
        out.loc[m, "n_ratings"] = nr
        reviews = _reviews_arr(h, url[m])
        is_beer = pt[m] == "beer"
        if is_beer.any():
            hb = h[is_beer]
            ids = url[m][is_beer].str.extract(pf.RX_BEER_IDS)
            brew = hb.str.extract(pf.RX_BEER_BREWERY)
            merged = (
                '{"beer_id":' + ids[1]
                + ',"brewery_id":' + ids[0]
                + ',"name":"' + _json_esc(hb.str.extract(pf.RX_BEER_NAME)[0])
                + '","brewery_name":"' + _json_esc(brew[1])
                + '","style":"' + _json_esc(hb.str.extract(pf.RX_BEER_STYLE)[0])
                + '","abv":' + hb.str.extract(pf.RX_BEER_ABV)[0].astype(float).astype(str)
                + ',"n_ratings":' + nr[is_beer].astype(int).astype(str)
                + ',"url":"' + _json_esc(url[m][is_beer])
                + '","reviews":' + reviews[is_beer] + "}"
            )
            out.loc[merged.index, "record_json"] = merged
        not_beer = ~is_beer
        if not_beer.any():
            out.loc[reviews[not_beer].index, "record_json"] = (
                '{"reviews":' + reviews[not_beer] + "}"
            )

    m = ok & (pt == "user")
    if m.any():
        h = html[m]
        rec = pd.DataFrame(
            {
                "user": h.str.extract(pf.RX_USER_NAME)[0],
                "user_id": h.str.extract(pf.RX_USER_ID)[0].astype("int64"),
                "url": url[m],
            }
        )
        out.loc[m, "record_json"] = pd.Series(
            [_dumps(r) for r in rec.to_dict("records")], index=rec.index
        )
    return out


def parse_fetched(fetched: DataFrame, agent: str | None = None) -> DataFrame:
    """fetched: (url, page_type, html|null, ...) -> PARSE_SCHEMA rows.
    ``agent`` is the advertised RFC 9309 product token for robots group
    selection (CrawlConfig.user_agent); None keeps `*`-group-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _parse_batch(pdf, agent)

    return fetched.select("url", "page_type", "html").mapInPandas(gen, PARSE_SCHEMA)


def records_from_parsed(parsed: DataFrame) -> dict[str, DataFrame]:
    """Re-type record_json JVM-side (from_json is codegen'd)."""
    brew = (
        parsed.filter((F.col("page_type") == "brewery") & F.col("record_json").isNotNull())
        .select(F.from_json("record_json", BREWERY_JSON_SCHEMA).alias("r"))
        .select("r.*")
    )
    beers = (
        parsed.filter((F.col("page_type") == "beer") & F.col("record_json").isNotNull())
        .select(F.from_json("record_json", BEER_JSON_SCHEMA).alias("r"))
        .select("r.*")
    )
    reviews = (
        parsed.filter(
            F.col("page_type").isin("beer", "review_page")
            & F.col("record_json").isNotNull()
        )
        .select(F.explode(F.from_json("record_json", REVIEWS_JSON_SCHEMA).reviews).alias("r"))
        .select("r.*")
        .withColumn("date", F.to_timestamp("date"))
    )
    users = (
        parsed.filter((F.col("page_type") == "user") & F.col("record_json").isNotNull())
        .select(F.from_json("record_json", USER_JSON_SCHEMA).alias("r"))
        .select("r.*")
    )
    return {"breweries": brew, "beers": beers, "reviews": reviews, "users": users}
