"""RocksDB state store (SURVEY.md §7.4's 10^10-scale streaming-state
path, previously design-only): Spark 4 ships
RocksDBStateStoreProvider natively, so the stateful streaming
operators run under it unmodified — state spills to disk instead of
bounding the seen set by executor heap.  These tests pin that each
stateful op (S2 dropDuplicates dedupe, S3/S4 watermarked windows, the
custom applyInPandasWithState token bucket) produces IDENTICAL results
under the default HDFS-backed provider and under RocksDB."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from beeradvocate_crawler_spark.fixtures.gen_site import write_pages_parquet
from beeradvocate_crawler_spark.streaming import rounds as S

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture(scope="module")
def rocks_pages(spark):
    tmp = tempfile.mkdtemp(prefix="ba_rocks_test_")
    write_pages_parquet(spark, "smoke", f"{tmp}/pages")
    yield f"{tmp}/pages"
    shutil.rmtree(tmp, ignore_errors=True)


def _with_provider(spark, provider):
    """Run queries under a given state-store provider; the conf is read
    at query start, so setting it per-test is enough."""
    old = spark.conf.get(PROVIDER_KEY, None)
    if provider is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, provider)
    return old


def _restore(spark, old):
    if old is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, old)


def _run_all(spark, pages_path):
    dedup = S.run_to_memory(
        S.streaming_seen_dedupe(S.corpus_stream(spark, pages_path)), "append"
    ).select("url_hash", "url").collect()
    win = S.run_to_memory(
        S.windowed_fetch_metrics(S.corpus_stream(spark, pages_path))
    ).collect()
    bucket = S.run_to_memory(
        S.token_bucket_stream(
            S.corpus_stream(spark, pages_path).select("url"), round_seconds=4
        ),
        "append",
    ).collect()
    return (
        sorted(map(tuple, dedup)),
        sorted(map(tuple, win)),
        sorted(map(tuple, bucket)),
    )


def test_stateful_ops_identical_under_rocksdb(spark, rocks_pages):
    old = _with_provider(spark, None)
    try:
        base = _run_all(spark, rocks_pages)
        _with_provider(spark, ROCKSDB)
        rocks = _run_all(spark, rocks_pages)
    finally:
        _restore(spark, old)
    assert base[0] == rocks[0], "S2 dedupe differs under RocksDB"
    assert base[1] == rocks[1], "windowed agg differs under RocksDB"
    assert base[2] == rocks[2], "token bucket differs under RocksDB"
    assert len(base[0]) > 0 and len(base[1]) > 1 and len(base[2]) > 0
