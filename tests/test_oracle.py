"""Oracle-level property tests (SURVEY.md §5.3): determinism, politeness
bounds, dedupe idempotence, robots observability — pure Python, fast."""

from __future__ import annotations

from collections import Counter

from beeradvocate_crawler_spark import oracle
from beeradvocate_crawler_spark.fixtures import site_model as sm


def test_determinism(smoke_site):
    _, corpus, res1 = smoke_site
    res2 = oracle.crawl(corpus, sm.SEED_URLS, round_seconds=16)
    assert res1.crawl_order == res2.crawl_order
    assert res1.seen == res2.seen


def test_politeness_budget_respected(smoke_site):
    _, corpus, res = smoke_site
    # per (round, host): admitted <= burst cap (2 * refill)
    per_round_host = Counter()
    for _rank, rnd, url in res.crawl_order:
        host = url.split("/")[2]
        per_round_host[(rnd, host)] += 1
    cap = 2 * 16 / 1.0
    assert all(v <= cap for v in per_round_host.values())


def test_budget_insensitive_coverage(smoke_site):
    """Politeness budget changes order/rounds, never coverage."""
    _, corpus, res16 = smoke_site
    res4 = oracle.crawl(corpus, sm.SEED_URLS, round_seconds=4)
    assert res4.seen == res16.seen
    assert sorted(u for _, _, u in res4.crawl_order) == sorted(
        u for _, _, u in res16.crawl_order
    )
    assert len(res4.reviews) == len(res16.reviews)
    assert res4.rounds > res16.rounds


def test_no_url_scheduled_twice(smoke_site):
    _, _, res = smoke_site
    urls = [u for _, _, u in res.crawl_order]
    assert len(urls) == len(set(urls))


def test_ranks_dense_and_rounds_monotone(smoke_site):
    _, _, res = smoke_site
    assert [r for r, _, _ in res.crawl_order] == list(range(len(res.crawl_order)))
    rounds = [rnd for _, rnd, _ in res.crawl_order]
    assert rounds == sorted(rounds)


def test_robots_blocking_observable(smoke_site):
    _, _, res = smoke_site
    blocked = {u for u, r in res.frontier.items() if r.state == "ROBOTS_BLOCKED"}
    assert "https://ba.example/beer/profile/0/0/?start=25&view=beer" in blocked
    scheduled = {u for _, _, u in res.crawl_order}
    assert not (blocked & scheduled)


def test_robots_fetched_before_content():
    pages = {p["url"]: p for p in __import__(
        "beeradvocate_crawler_spark.fixtures.gen_site", fromlist=["generate_pages"]
    ).generate_pages("smoke")}
    res = oracle.crawl(pages, sm.SEED_URLS, round_seconds=16)
    first_by_host: dict[str, str] = {}
    for _, _, u in res.crawl_order:
        host = u.split("/")[2]
        first_by_host.setdefault(host, u)
    for host, first in first_by_host.items():
        assert first.endswith("/robots.txt"), (host, first)


def test_priority_ordering_within_round(smoke_site):
    """Within any round, brewery pages schedule before beer pages
    before review-pagination (the north-rule priority)."""
    _, _, res = smoke_site
    from beeradvocate_crawler_spark.functions.urlnorm import PAGE_PRIORITY, classify_url

    by_round: dict[int, list[int]] = {}
    for _, rnd, u in res.crawl_order:
        by_round.setdefault(rnd, []).append(PAGE_PRIORITY[classify_url(u)])
    for rnd, prios in by_round.items():
        assert prios == sorted(prios, reverse=True), rnd
