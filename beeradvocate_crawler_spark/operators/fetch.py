"""Batch fetch = corpus lookup join + hot-host salting
(SURVEY.md §2 A13/A14).

"Fetching" a URL is an equi-join of the scheduled batch against the
``pages`` corpus (the deterministic stand-in for HTTP over
Common-Crawl-style tables, BASELINE.json north_star).  Scale design:

- the corpus is directory-partitioned by ``bucket =
  pmod(xxhash64(host), n_buckets)``; the scheduled batch's buckets are
  collected (bounded by n_buckets) and pushed as a partition-pruning
  filter, so a 10^10-row corpus scan touches only the scheduled hosts'
  files;
- ``html`` is projected only here and parsed immediately (column
  pruning keeps the fat binary out of every other stage);
- hot-host skew (A14): the join key is ``url``, whose hash is uniform
  even when ONE host owns the whole batch — so the fetch shuffle and
  the downstream mapInPandas parse are naturally balanced; the salted
  split is only needed for *per-host* grouped stages (admission
  window; see operators/politeness.py), with AQE skew-join as the
  join-side backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_join(
    admitted: DataFrame,
    pages: DataFrame,
    n_buckets: int,
    prune_buckets: bool = True,
) -> DataFrame:
    """admitted (url, ...) x pages (url, html, bucket) -> left join.
    Missing page => html null => fetch_status 404 downstream."""
    corpus = pages
    if prune_buckets and "bucket" in pages.columns:
        buckets = [
            r["b"]
            for r in admitted.select(
                F.pmod(F.xxhash64("host"), F.lit(n_buckets)).alias("b")
            )
            .distinct()
            .collect()
        ]
        corpus = pages.where(F.col("bucket").isin(buckets))
    return admitted.join(corpus.select("url", "html"), "url", "left")
