"""URL-seen set: approximate pre-filter + exact anti-join (§2 A7/A8).

Two interchangeable pre-filter kinds cover the north rule's
"bloom/cuckoo URL-seen" [B:14]: the default partitioned **cuckoo**
filter (functions/cuckoo.py) and a partitioned **blocked-bloom**
filter (functions/bloom.py), selected by ``CrawlConfig.filter_kind``.
Blobs self-describe (the bloom blob leads with a negative magic int64;
a cuckoo blob leads with its positive power-of-two bucket count), so
``decode_filter`` dispatches per blob and a crawl resumed under the
other kind keeps probing old blobs correctly while writing new-kind
deltas.

Exactness layering (§7.1): either filter only PRUNES — candidates
it proves absent skip the anti-join; "maybe seen" survivors (all true
dupes + ~0.012% cuckoo / ~0.5% bloom false positives) still go through
the exact left-anti join against ``seen``, which remains the
authority.  A filter bug can cost performance, never correctness.

Blob lifecycle (delta + compaction): each round inserts the round's
new keys into a FRESH delta blob per partition (sized exactly, never
overflows); lookup ORs membership across the partition's blobs; every
``filter_compact_every`` rounds the blobs are rebuilt from the
``seen`` table in one distributed pass, bounding probe cost.  At
10^10 URLs the seen table is ~petabyte-adjacent; the filter is what
keeps every round from shuffling it (§4.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.bloom import BlockedBloomFilter
from ..functions.cuckoo import CuckooFilter

FILTER_KINDS = {"cuckoo": CuckooFilter, "bloom": BlockedBloomFilter}


def decode_filter(blob: bytes):
    """Blob-self-describing decode: bloom blobs lead with a negative
    magic int64, cuckoo blobs with a positive power-of-two n_buckets."""
    first = int(np.frombuffer(bytes(blob)[:8], dtype=np.int64)[0])
    return (
        BlockedBloomFilter.from_bytes(bytes(blob))
        if first < 0
        else CuckooFilter.from_bytes(bytes(blob))
    )


BLOB_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("n_keys", T.LongType()),
    ]
)


def partition_id_expr(url_hash, n_parts: int):
    return F.pmod(url_hash, F.lit(n_parts)).cast("int")


def dedupe_exact(candidates: DataFrame, seen: DataFrame | None) -> DataFrame:
    """A7: authoritative exact dedupe — hash anti-join on (url_hash, url)."""
    if seen is None:
        return candidates
    return candidates.join(seen, ["url_hash", "url"], "left_anti")


def cuckoo_prefilter(
    candidates: DataFrame, blobs: DataFrame | None, n_parts: int
) -> DataFrame:
    """A8: adds ``maybe_seen`` (bool).  False => definitely new (skip
    the anti-join).  Implemented as a cogrouped-map pandas UDF so each
    partition's candidate batch meets its filter blobs without
    shuffling the seen table.  Blob kind (cuckoo/bloom) is decoded per
    blob, so mixed-kind blob sets (a resume that switched kinds) work."""
    cand = candidates.withColumn(
        "partition_id", partition_id_expr(F.col("url_hash"), n_parts)
    )
    if blobs is None:
        return cand.withColumn("maybe_seen", F.lit(False)).drop("partition_id")
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series(dtype=bool))
        maybe = np.zeros(len(left), dtype=bool)
        keys = left["url_hash"].to_numpy(dtype=np.int64)
        for b in right["blob"]:
            maybe |= decode_filter(b).contains(keys)
        return left.assign(maybe_seen=maybe)

    return (
        cand.groupBy("partition_id")
        .cogroup(blobs.groupBy("partition_id"))
        .applyInPandas(probe, out_schema)
        .drop("partition_id")
    )


def build_delta_blobs(
    new_rows: DataFrame, n_parts: int, rnd: int, n_rows: int | None = None,
    kind: str = "cuckoo",
) -> DataFrame:
    """Fresh delta blob per partition holding this round's new keys.

    Task count adapts to the delta size (each task builds the blobs of
    the partition_ids it holds — blob layout is always the n_parts
    pmod, independent of task count), so a 100-row round doesn't pay
    n_parts python-worker round-trips while a 1M-row round fans out."""
    fcls = FILTER_KINDS[kind]

    def build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            for pid, g in pdf.groupby("partition_id"):
                keys = g["url_hash"].to_numpy(dtype=np.int64)
                cf = fcls.sized_for(len(keys))
                cf.insert(keys)
                yield pd.DataFrame(
                    {
                        "partition_id": [int(pid)],
                        "round": [rnd],
                        "blob": [cf.to_bytes()],
                        "n_keys": [len(keys)],
                    }
                )

    n_tasks = n_parts
    if n_rows is not None:
        n_tasks = max(1, min(n_parts, n_rows // 50_000 + 1))
    return (
        new_rows.select(
            partition_id_expr(F.col("url_hash"), n_parts).alias("partition_id"),
            "url_hash",
        )
        .repartition(n_tasks, "partition_id")
        .mapInPandas(build, BLOB_SCHEMA)
    )


def compact_blobs(
    seen: DataFrame, n_parts: int, rnd: int, kind: str = "cuckoo"
) -> DataFrame:
    """Rebuild one blob per partition from the full seen table — a
    single distributed pass; bounds lookup cost to O(1) blobs/partition."""
    out_schema = BLOB_SCHEMA
    fcls = FILTER_KINDS[kind]

    def rebuild(key, pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        cf = fcls.sized_for(max(64, len(keys)))
        cf.insert(keys)
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "round": [rnd],
                "blob": [cf.to_bytes()],
                "n_keys": [len(keys)],
            }
        )

    return (
        seen.select(
            partition_id_expr(F.col("url_hash"), n_parts).alias("partition_id"),
            "url_hash",
        )
        .groupBy("partition_id")
        .applyInPandas(rebuild, out_schema)
    )
