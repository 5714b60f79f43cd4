"""Materialize the synthetic site as a ``pages`` corpus (FIXTURES.md §1).

``generate_pages(scale)`` returns deterministic page dicts with the
exact input shape mandated by BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

``write_pages_parquet(spark, scale, out_dir)`` writes the corpus
partitioned by ``bucket = pmod(xxhash64(host), n_buckets)`` so the
engine's fetch-join can prune to the scheduled hosts' buckets — the
layout that matters at 100 TB (a 10^10-row corpus is only joinable
per-round because the scheduled batch touches few buckets).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from . import site_model as sm


def generate_pages(scale: str = "smoke") -> list[dict]:
    cfg = sm.SCALES[scale]
    P, B, K, R = cfg["P"], cfg["B"], cfg["K"], cfg["R"]
    U = sm.n_users(P, B, K)
    t0 = datetime(2024, 1, 1)
    pages: list[dict] = []

    def add(url: str, body: str, lang: str = "en") -> None:
        pages.append(
            {
                "url": url,
                "warc_ts": t0 + timedelta(seconds=len(pages)),
                "html": body.encode("utf-8"),
                "text": sm.html_to_text(body),
                "lang": lang,
            }
        )

    # robots first (ord 0..): main host + noise hosts
    robots_main = sm.render_robots_main(P, B, K)
    pages.append(
        {
            "url": sm.url_robots(),
            "warc_ts": t0,
            "html": robots_main.encode("utf-8"),
            "text": robots_main,  # robots text == raw body (passthrough)
            "lang": "en",
        }
    )
    for k in range(7):
        body = sm.render_robots_noise()
        pages.append(
            {
                "url": sm.url_robots(sm.noise_host(k)),
                "warc_ts": t0 + timedelta(seconds=len(pages)),
                "html": body.encode("utf-8"),
                "text": body,
                "lang": "en",
            }
        )

    add(sm.url_place_dir(), sm.render_place_dir(P))
    for i in range(P):
        for start in range(0, B, sm.BREWERIES_PER_PLACE_PAGE):
            add(sm.url_place(i, start), sm.render_place(i, start, B))
    for i in range(P):
        for b in range(B):
            bid = sm.brewery_id(i, b)
            add(sm.url_brewery(bid), sm.render_brewery(i, bid, K))
            for j in range(K):
                beer = sm.beer_id(bid, j)
                nr = sm.beer_n_ratings(beer, R)
                add(sm.url_beer(bid, beer), sm.render_beer_page(bid, beer, 0, R, U))
                for start in range(sm.REVIEWS_PER_PAGE, nr, sm.REVIEWS_PER_PAGE):
                    add(
                        sm.url_review_page(bid, beer, start),
                        sm.render_beer_page(bid, beer, start, R, U),
                    )
    for uid in range(U):
        add(sm.url_user(uid), sm.render_user(uid, P))
    # ~5% noise rows on off-site hosts (never crawled; corpus-scan chaff)
    n_noise = max(4, len(pages) // 20)
    for j in range(n_noise):
        add(
            f"https://{sm.noise_host(j)}/promo/{j}",
            sm.render_noise(j),
            lang="de" if j % 3 == 0 else "en",
        )
    return pages


def pages_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )


def write_pages_parquet(spark, scale: str, out_dir: str, n_buckets: int = 16) -> str:
    """Write the corpus bucketed by host hash (directory-partitioned on
    ``bucket`` so fetch-joins prune scanned files to scheduled hosts)."""
    from pyspark.sql import functions as F

    rows = generate_pages(scale)
    df = spark.createDataFrame(rows, schema=pages_schema())
    (
        df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.parse_url("url", F.lit("HOST"))), F.lit(n_buckets)),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    return out_dir
