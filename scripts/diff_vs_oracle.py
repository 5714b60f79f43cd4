"""Differential check: Spark engine vs sequential oracle on a synthetic
corpus.  Usage: python scripts/diff_vs_oracle.py [scale] [round_seconds]
Exits nonzero on any divergence; prints a concise diff summary."""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beeradvocate_crawler_spark import oracle
from beeradvocate_crawler_spark.testing import compare
from beeradvocate_crawler_spark.config import CrawlConfig
from beeradvocate_crawler_spark.fixtures import site_model as sm
from beeradvocate_crawler_spark.fixtures.gen_site import generate_pages, write_pages_parquet
from beeradvocate_crawler_spark.plans import crawl as plans
from beeradvocate_crawler_spark.session import get_spark


def main() -> int:
    scale = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    rs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    master = sys.argv[3] if len(sys.argv) > 3 else "local[8]"
    pages = generate_pages(scale)
    corpus = {p["url"]: p for p in pages}
    ores = oracle.crawl(corpus, sm.SEED_URLS, round_seconds=rs)
    print(f"oracle: rounds={ores.rounds} order={len(ores.crawl_order)} "
          f"seen={len(ores.seen)} reviews={len(ores.reviews)}")

    spark = get_spark(master=master)
    tmp = tempfile.mkdtemp(prefix="crawlrun_")
    try:
        pages_path = f"{tmp}/pages"
        write_pages_parquet(spark, scale, pages_path)
        run_dir = f"{tmp}/run"
        plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                  CrawlConfig(round_seconds=rs))
        errs = compare(spark, run_dir, ores, corpus)
        if errs:
            print("DIVERGENCE:")
            for e in errs:
                print(" ", e)
            return 1
        m = plans.SnapshotCatalog(spark, run_dir).latest()
        print(f"engine: round={m.round} MATCHES oracle exactly "
              f"(order, seen, texts, records)")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
