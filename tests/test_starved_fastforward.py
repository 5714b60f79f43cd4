"""Starved-round fast-forward (round-4 VERDICT ask #4: adaptive
terminal-round batching).

A starved round (pending rows exist, zero admissions) changes nothing
but candidate hosts' token levels, so its no-op successors are batched
into one commit.  Because burst = 2x refill, a candidate host either
admits within one more refill or NEVER can (burst < 1 token) — so the
reachable cases are a single-round skip and the permanent-starvation
jump to the round horizon.  The differential twin here builds the
permanent case: a host whose robots.txt sets Crawl-delay 4x the round
budget (refill 0.25, burst 0.5 < 1 token) — the oracle idles from
round 2 to max_rounds one round at a time; the engine must reach the
IDENTICAL end state (ledger, seen, final round number, exact token
float) in O(1) commits instead of O(max_rounds).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from beeradvocate_crawler_spark import oracle
from beeradvocate_crawler_spark.config import CrawlConfig
from beeradvocate_crawler_spark.fixtures.gen_site import pages_schema
from beeradvocate_crawler_spark.functions.xxh64 import xxh64_signed
from beeradvocate_crawler_spark.plans import crawl as plans
from beeradvocate_crawler_spark.sources.ingest import write_corpus

ROBOTS_URL = "https://slow.example/robots.txt"
BREWERY_URL = "https://slow.example/beer/profile/1/"
ROBOTS_BODY = "User-agent: *\nCrawl-delay: 16\n"
MAX_ROUNDS = 40


def _pages() -> list[dict]:
    from datetime import datetime

    t0 = datetime(2024, 1, 1)
    return [
        {"url": ROBOTS_URL, "warc_ts": t0, "html": ROBOTS_BODY.encode(),
         "text": ROBOTS_BODY, "lang": "en"},
        {"url": BREWERY_URL, "warc_ts": t0, "html": b"<html>quiet</html>",
         "text": "quiet", "lang": "en"},
    ]


def test_permanently_starved_host_fast_forwards(spark):
    pages = _pages()
    corpus = {p["url"]: p for p in pages}
    # round_seconds=4 vs Crawl-delay 16 -> refill 0.25/round, burst 0.5:
    # the brewery page can never be admitted after robots lands
    ores = oracle.crawl(corpus, [BREWERY_URL], round_seconds=4,
                        max_rounds=MAX_ROUNDS)
    assert ores.rounds == MAX_ROUNDS  # oracle idles to the horizon
    assert [u for _, _, u in ores.crawl_order] == [ROBOTS_URL]

    tmp = tempfile.mkdtemp(prefix="ba_starved_")
    try:
        pages_path = f"{tmp}/pages"
        write_corpus(spark.createDataFrame(pages, schema=pages_schema()),
                     pages_path, 16, 4)
        cat = plans.run(
            spark, pages_path, [BREWERY_URL], f"{tmp}/run",
            CrawlConfig(round_seconds=4, max_rounds=MAX_ROUNDS),
        )
        m = cat.latest()
        # identical end state, O(1) commits: the engine's final round
        # number equals the oracle's horizon, reached by ONE
        # fast-forward commit (manifest count stays tiny)
        assert m.round == ores.rounds == MAX_ROUNDS
        assert m.lineage.get("fast_forwarded_from") == 2
        got_order = [
            (r["rank"], r["round"], r["url"])
            for r in cat.read("crawl_order").orderBy("rank").collect()
        ]
        assert got_order == ores.crawl_order
        got_seen = {(r["url"], r["url_hash"])
                    for r in cat.read("seen").collect()}
        assert got_seen == {(u, xxh64_signed(u)) for u in ores.seen}
        # token float must match the oracle's ITERATED refills exactly
        # (min(burst, t + r) is a fixed point at burst after 2 steps)
        hs = {r["host"]: r for r in cat.read("host_state").collect()}
        assert hs["slow.example"]["tokens"] == 0.5
        assert hs["slow.example"]["crawl_delay"] == 16.0
        # the brewery row is still PENDING in the frontier (never
        # terminal — starvation is not a terminal state)
        pending = cat.read("frontier").where(F.col("state") == "PENDING")
        assert [r["url"] for r in pending.collect()] == [BREWERY_URL]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_starved_fastforward_resume_is_noop(spark):
    """Resume from the fast-forwarded snapshot: the horizon round is
    the latest manifest, so resume must terminate immediately with the
    state unchanged (exact-resume across a fast-forward boundary)."""
    pages = _pages()
    tmp = tempfile.mkdtemp(prefix="ba_starved_rs_")
    try:
        pages_path = f"{tmp}/pages"
        write_corpus(spark.createDataFrame(pages, schema=pages_schema()),
                     pages_path, 16, 4)
        run_dir = f"{tmp}/run"
        cfg = CrawlConfig(round_seconds=4, max_rounds=MAX_ROUNDS)
        cat = plans.run(spark, pages_path, [BREWERY_URL], run_dir, cfg)
        before = (cat.latest().round,
                  cat.read("crawl_order").count(), cat.read("seen").count())
        cat2 = plans.resume(spark, pages_path, run_dir, cfg)
        after = (cat2.latest().round,
                 cat2.read("crawl_order").count(), cat2.read("seen").count())
        assert before == after == (MAX_ROUNDS, 1, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
