"""Deterministic synthetic BeerAdvocate-shaped site (FIXTURES.md §1).

Everything is a pure function of ids — no wall clock, no RNG state —
so goldens are stable across sessions and parallelism levels
(SURVEY.md §4.2, §5.4).  The site graph:

    https://ba.example/place/directory/                (place_dir)
      -> /place/list/?c_id={i}[&start=20k]             (place, 20 breweries/page)
        -> /beer/profile/{bid}/                        (brewery)
          -> /beer/profile/{bid}/{beer_id}/            (beer, 25 reviews/page)
            -> ?start=25k&view=beer                    (review_page, generated
                                                        from the ratings count,
                                                        NOT present as hrefs)
            -> /community/members/{name}.{uid}/        (user)
    plus robots.txt per host and off-site noise pages/links that the
    engine must classify-and-drop.

The single hot host ba.example reproduces the reference's by-construction
skew (every entity page on one domain) [BASELINE.json north_star].
"""

from __future__ import annotations

from datetime import datetime, timedelta

HOST = "ba.example"
BASE = f"https://{HOST}"
SEED_URLS = [f"{BASE}/place/directory/"]

BREWERIES_PER_PLACE_PAGE = 20
REVIEWS_PER_PAGE = 25

STYLES = ["IPA", "Stout", "Pilsner", "Lager", "Porter", "Saison", "Ale", "Witbier"]
ADJS = ["crisp", "hazy", "roasty", "bright", "malty", "dank", "tart", "smooth"]
NOUNS = ["citrus", "pine", "coffee", "caramel", "stone fruit", "grass", "cocoa", "bread"]
MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

SCALES: dict[str, dict[str, int]] = {
    # P places, B breweries/place, K beers/brewery, R base reviews/beer
    "smoke": dict(P=2, B=3, K=4, R=30),          # ~160 pages  (t1 / e2e test)
    "correctness": dict(P=5, B=8, K=10, R=60),   # ~1.9k pages (t2)
    "bench": dict(P=20, B=40, K=25, R=120),      # ~110k pages (throughput)
    # N-vs-4N scaling evidence: ~1.5M pages / ~12 GB html, B=20 keeps
    # place pagination flat so the crawl is 2 giant rounds + short tail
    # — parallel parse/link work dominates the per-round fixed cost
    "scaling": dict(P=100, B=20, K=60, R=300),
}


def n_users(P: int, B: int, K: int) -> int:
    return min(200, max(20, P * B * K))


# --------------------------------------------------------------------------
# deterministic entity formulas
# --------------------------------------------------------------------------

def place_name(i: int) -> str:
    return f"Place {i}"


def brewery_id(place_i: int, b: int) -> int:
    return place_i * 100 + b  # B <= 40 < 100 at all scales


def brewery_name(bid: int) -> str:
    return f"Brewery {bid}"


def beer_id(bid: int, j: int) -> int:
    return bid * 100 + j  # K <= 25 < 100


def beer_name(beer: int) -> str:
    return f"Beer {beer}"


def beer_style(beer: int) -> str:
    return STYLES[beer % len(STYLES)]


def beer_abv(beer: int) -> float:
    return (40 + beer % 61) / 10  # 4.0 .. 10.0


def beer_n_ratings(beer: int, R: int) -> int:
    return max(1, R - beer % 11)


def fmt_date(d: datetime) -> str:
    return f"{MONTHS[d.month - 1]} {d.day}, {d.year}"  # "Apr 5, 2017" style


def review_user_id(beer: int, r: int, U: int) -> int:
    return (beer * 7 + r * 13) % U


def user_name(uid: int) -> str:
    return f"taster_{uid}"


def review_score(beer: int, r: int) -> float:
    return round(1.0 + ((beer + 7 * r) % 41) / 10, 1)


def review_aspects(beer: int, r: int) -> tuple[float, float, float, float, float]:
    def a(m: int) -> float:
        return round(1.0 + ((beer + m * r) % 41) / 10, 1)

    return a(3), a(5), a(11), a(17), a(23)


def review_date(beer: int, r: int) -> datetime:
    return datetime(2015, 1, 1) + timedelta(days=(beer * 3 + r * 11) % 1460)


def review_text(beer: int, r: int) -> str:
    adj = ADJS[(beer + r) % len(ADJS)]
    n1 = NOUNS[(beer + 2 * r) % len(NOUNS)]
    n2 = NOUNS[(beer + 3 * r + 1) % len(NOUNS)]
    return (
        f"A {adj} {beer_style(beer)} with notes of {n1} and {n2}. "
        f"Pour {((beer + r) % 4) + 1} fingers of foam. Batch {r}."
    )


def user_join_date(uid: int) -> datetime:
    return datetime(2010, 1, 1) + timedelta(days=uid * 17 % 3650)


def user_location(uid: int, P: int) -> str:
    return place_name(uid % max(1, P))


# --------------------------------------------------------------------------
# URL builders (already canonical: sorted query params, trailing slash)
# --------------------------------------------------------------------------

def url_place_dir() -> str:
    return f"{BASE}/place/directory/"


def url_place(i: int, start: int = 0) -> str:
    if start:
        return f"{BASE}/place/list/?c_id={i}&start={start}"
    return f"{BASE}/place/list/?c_id={i}"


def url_brewery(bid: int) -> str:
    return f"{BASE}/beer/profile/{bid}/"


def url_beer(bid: int, beer: int) -> str:
    return f"{BASE}/beer/profile/{bid}/{beer}/"


def url_review_page(bid: int, beer: int, start: int) -> str:
    return f"{BASE}/beer/profile/{bid}/{beer}/?start={start}&view=beer"


def url_user(uid: int) -> str:
    return f"{BASE}/community/members/{user_name(uid)}.{uid}/"


def url_robots(host: str = HOST) -> str:
    return f"https://{host}/robots.txt"


def noise_host(k: int) -> str:
    return f"noise{k % 7}.example"


# --------------------------------------------------------------------------
# HTML renderers
# --------------------------------------------------------------------------

def render_place_dir(P: int) -> str:
    lis = "\n".join(
        f'<li><a href="/place/list/?c_id={i}">{place_name(i)}</a></li>'
        for i in range(P)
    )
    ads = (
        f'<a href="https://{noise_host(0)}/promo/0">Sponsored 0</a> '
        f'<a href="https://{noise_host(1)}/promo/1">Sponsored 1</a> '
        '<a href="mailto:info@ba.example">contact</a> '
        '<a href="javascript:void(0)">menu</a>'
    )
    return (
        "<html><head><title>Place Directory | BA</title></head><body>\n"
        "<h1>Place Directory</h1>\n"
        f'<ul class="places">\n{lis}\n</ul>\n'
        f'<div class="ads">{ads}</div>\n'
        "</body></html>"
    )


def render_place(i: int, start: int, B: int) -> str:
    bids = [brewery_id(i, b) for b in range(start, min(start + BREWERIES_PER_PLACE_PAGE, B))]
    lis = "\n".join(
        f'<li><a href="/beer/profile/{bid}/">{brewery_name(bid)}</a></li>'
        for bid in bids
    )
    nxt = ""
    if start + BREWERIES_PER_PLACE_PAGE < B:
        nxt = (
            f'\n<a class="next" href="/place/list/'
            f'?c_id={i}&start={start + BREWERIES_PER_PLACE_PAGE}">next page</a>'
        )
    return (
        f"<html><head><title>{place_name(i)} Breweries | BA</title></head><body>\n"
        f"<h1>Breweries in {place_name(i)}</h1>\n"
        f'<ul class="breweries">\n{lis}\n</ul>{nxt}\n'
        "</body></html>"
    )


def render_brewery(place_i: int, bid: int, K: int) -> str:
    # relative hrefs on purpose — exercises RFC-3986 resolution (A2)
    lis = "\n".join(
        f'<li><a href="{beer_id(bid, j)}/">{beer_name(beer_id(bid, j))}</a></li>'
        for j in range(K)
    )
    return (
        f"<html><head><title>{brewery_name(bid)} | BA</title></head><body>\n"
        f'<h1 class="brewery">{brewery_name(bid)}</h1>\n'
        f'<div class="info">Location: <span class="place">{place_name(place_i)}</span>'
        f' | Beers: <span class="nbeers">{K}</span></div>\n'
        f'<ul class="beers">\n{lis}\n</ul>\n'
        f'<div class="ads"><a href="https://{noise_host(bid)}/promo/{bid}">Partner</a></div>\n'
        "</body></html>"
    )


def render_review_block(beer: int, r: int, U: int) -> str:
    uid = review_user_id(beer, r, U)
    look, smell, taste, feel, overall = review_aspects(beer, r)
    return (
        '<div class="review">\n'
        f'<span class="score">{review_score(beer, r):.1f}/5</span>\n'
        f'<span class="aspects">look: {look:.1f} | smell: {smell:.1f} | '
        f'taste: {taste:.1f} | feel: {feel:.1f} | overall: {overall:.1f}</span>\n'
        f'<a class="user" href="/community/members/{user_name(uid)}.{uid}/">{user_name(uid)}</a>\n'
        f'<span class="date">{fmt_date(review_date(beer, r))}</span>\n'
        f'<p class="rtext">{review_text(beer, r)}</p>\n'
        "</div>"
    )


def render_beer_page(bid: int, beer: int, start: int, R: int, U: int) -> str:
    nr = beer_n_ratings(beer, R)
    blocks = "\n".join(
        render_review_block(beer, r, U) for r in range(start, min(start + REVIEWS_PER_PAGE, nr))
    )
    return (
        f"<html><head><title>{beer_name(beer)} | BA</title></head><body>\n"
        f'<h1 class="beer">{beer_name(beer)}</h1>\n'
        f'<div class="brewery"><a href="/beer/profile/{bid}/">{brewery_name(bid)}</a></div>\n'
        f'<dl class="stats"><dt>Style:</dt><dd>{beer_style(beer)}</dd>'
        f"<dt>ABV:</dt><dd>{beer_abv(beer):.1f}%</dd>"
        f"<dt>Ratings:</dt><dd>{nr}</dd></dl>\n"
        f'<div class="reviews">\n{blocks}\n</div>\n'
        "</body></html>"
    )


def render_user(uid: int, P: int) -> str:
    return (
        f"<html><head><title>{user_name(uid)} | BA</title></head><body>\n"
        f'<h1 class="user">{user_name(uid)}</h1>\n'
        f'<div class="meta">Member: <span class="uid">{uid}</span></div>\n'
        f'<div class="joined">Joined: {fmt_date(user_join_date(uid))}</div>\n'
        f'<div class="loc">Location: {user_location(uid, P)}</div>\n'
        "</body></html>"
    )


def render_noise(j: int) -> str:
    return (
        f"<html><head><title>Promo {j}</title></head><body>"
        f"<h1>Promo {j}</h1><p>Nothing to see here.</p></body></html>"
    )


def render_robots_main(P: int, B: int, K: int) -> str:
    """ba.example robots: blocks one beer's review pagination (prefix
    ends with '?' so the beer page itself stays allowed), carves one
    start= page back out via a longer Allow (longest-prefix-wins), and
    sets Crawl-delay — all observable in goldens (FIXTURES.md §1.2)."""
    bid0 = brewery_id(0, 0)
    beer0 = beer_id(bid0, 0)
    return (
        "# synthetic robots for ba.example\n"
        "User-agent: googlebot\n"
        "Disallow: /private/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /rate/\n"
        f"Disallow: /beer/profile/{bid0}/{beer0}/?\n"
        f"Allow: /beer/profile/{bid0}/{beer0}/?start=50&\n"
        "Crawl-delay: 1\n"
    )


def render_robots_noise() -> str:
    return "User-agent: *\nDisallow:\n"


# canonical text extraction lives engine-side; the generator uses it to
# write the pages.text goldens (byte-identical-text invariant, B:15)
from ..functions.textextract import html_to_text  # noqa: E402,F401
