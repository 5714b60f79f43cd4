"""Differential comparison helpers: Spark engine output vs the
sequential oracle (SURVEY.md §5.2/§5.3).  Used by the pytest e2e suite
and scripts/diff_vs_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import oracle
from .plans import crawl as plans
from .functions.xxh64 import xxh64_signed
from .operators.links import classify_expr


def compare(spark, run_dir: str, ores, corpus) -> list[str]:
    errs: list[str] = []
    t = plans.result_tables(spark, run_dir)

    # fetch_join contract (operators/fetch.py): the broadcast path
    # recomputes page_type = classify_expr(url) on corpus hits, which
    # is only sound if every frontier row's stored page_type equals the
    # classifier's output — assert that invariant over the whole run
    if "frontier" in t:
        n_bad_pt = (
            t["frontier"]
            .where(F.col("page_type") != classify_expr(F.col("url")))
            .count()
        )
        if n_bad_pt:
            errs.append(
                f"{n_bad_pt} frontier rows violate page_type=="
                "classify_expr(url) (fetch_join broadcast-path contract)"
            )

    got_order = [
        (r["rank"], r["round"], r["url"])
        for r in t["crawl_order"].orderBy("rank").collect()
    ]
    if got_order != ores.crawl_order:
        errs.append(
            f"crawl_order mismatch: engine {len(got_order)} rows vs oracle "
            f"{len(ores.crawl_order)}"
        )
        for i, (g, o) in enumerate(zip(got_order, ores.crawl_order)):
            if g != o:
                errs.append(f"  first divergence at rank {i}: engine={g} oracle={o}")
                break
        if len(got_order) != len(ores.crawl_order):
            gs = {u for _, _, u in got_order}
            os_ = {u for _, _, u in ores.crawl_order}
            errs.append(f"  engine-only: {sorted(gs - os_)[:5]}")
            errs.append(f"  oracle-only: {sorted(os_ - gs)[:5]}")

    got_seen = {(r["url"], r["url_hash"]) for r in t["seen"].collect()}
    want_seen = {(u, h) for u, h in zip(sorted(ores.seen),
                                        [xxh64_signed(u) for u in sorted(ores.seen)])}
    if got_seen != want_seen:
        errs.append(
            f"seen mismatch: engine {len(got_seen)} vs oracle {len(want_seen)}; "
            f"engine-only {sorted({u for u,_ in got_seen} - ores.seen)[:5]}, "
            f"oracle-only {sorted(ores.seen - {u for u,_ in got_seen})[:5]}"
        )

    # byte-identical text per url (engine parse vs corpus golden)
    got_texts = {r["url"]: r["text"] for r in t["texts"].collect()}
    bad = [u for u, txt in got_texts.items()
           if u in corpus and corpus[u]["text"] != txt]
    if bad:
        errs.append(f"text mismatches vs corpus goldens: {len(bad)} e.g. {bad[:3]}")
    obad = [u for u, txt in got_texts.items()
            if u in ores.texts and ores.texts[u] != txt]
    if obad:
        errs.append(f"text mismatches vs oracle: {len(obad)} e.g. {obad[:3]}")
    if set(got_texts) != set(ores.texts):
        errs.append(
            f"parsed-url set mismatch: engine-only "
            f"{sorted(set(got_texts) - set(ores.texts))[:5]}, oracle-only "
            f"{sorted(set(ores.texts) - set(got_texts))[:5]}"
        )

    # records
    def _recs(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    checks = [
        ("breweries", ["brewery_id", "name", "place", "nbr_beers", "url"], ores.breweries),
        ("beers", ["beer_id", "brewery_id", "name", "style", "abv", "n_ratings", "url"], ores.beers),
        ("users", ["user", "user_id", "url"], ores.users),
        ("reviews", ["beer_id", "user", "score", "look", "smell", "taste", "feel",
                     "overall", "date", "text", "url"], ores.reviews),
    ]
    for name, cols, want_rows in checks:
        got = _recs(t[name].select(*cols), cols)
        want = sorted(tuple(w[c] for c in cols) for w in want_rows)
        if got != want:
            errs.append(f"{name} mismatch: engine {len(got)} vs oracle {len(want)}")
            for g, w in zip(got, want):
                if g != w:
                    errs.append(f"  first diff:\n   engine={g}\n   oracle={w}")
                    break
    return errs


