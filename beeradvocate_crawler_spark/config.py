"""Crawl engine configuration."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CrawlConfig:
    # politeness: logical seconds of crawl budget per round (§4.2 —
    # round index is the only clock, so admission is deterministic
    # and cluster-size-independent)
    round_seconds: int = 16
    max_rounds: int = 100000
    # RFC 9309 product token the crawler advertises for robots group
    # selection (functions/robots.py::parse_robots): None -> only the
    # `User-agent: *` groups apply (the default, and the reference
    # behavior); a token selects case-insensitive matching groups and
    # then the `*` groups do NOT apply.  The sequential oracle takes
    # the same parameter, so the e2e differential covers it.
    user_agent: str | None = None
    # cuckoo-filter seen pre-filter (A8); exact anti-join stays authoritative.
    # Partition count caps the parallelism of the two Python blob stages
    # (probe cogroup + delta build) — 8 was a measured 4->16-thread
    # scaling sink in the heavy rounds; results are partition-count
    # independent (the exact anti-join is the authority)
    use_cuckoo: bool = True
    # which approximate membership structure backs the pre-filter blobs
    # (north rule "bloom/cuckoo URL-seen" [B:14]): "cuckoo" (16-bit fp,
    # ~0.012% FPR, ~19 bits/key) or "bloom" (blocked 512-bit lines,
    # ~0.5% FPR, 12 bits/key, overflow-free).  Blobs self-describe, so
    # a resume may switch kinds mid-crawl; outputs are identical either
    # way — the exact anti-join stays authoritative (§7.1).
    filter_kind: str = "cuckoo"
    n_filter_partitions: int = 32
    # probe the filter only once `seen` exceeds this many rows: the
    # filter exists to avoid shuffling a HUGE seen table — while seen
    # is small the exact anti-join is cheaper than the cogroup's
    # Python stage.  Blobs are still built/compacted every round so
    # resume and the big-seen path stay exercised.  (Results are
    # identical either way — cuckoo on/off equivalence is a test.)
    cuckoo_min_seen_rows: int = 100_000
    filter_compact_every: int = 8  # rebuild delta blobs from `seen` every k rounds
    # pre-merge seen filter: while `seen` fits a broadcast, already-seen
    # child links are dropped map-side BEFORE the min-depth merge
    # shuffle (most children are navigation back-links); beyond this the
    # cuckoo pre-filter is the scale path.  ~2M urls ≈ 150 MB relation.
    broadcast_seen_threshold: int = 2_000_000
    # pages corpus bucketing (fetch-join pruning); files_per_bucket is
    # normally read from the corpus writer's sidecar metadata
    # (sources/corpus.py) — set explicitly only to override it
    n_page_buckets: int = 16
    files_per_bucket: int | None = None
    # corpus caching: OFF by default — the fetch path prunes partition
    # directories per round, so parquet re-scans touch only the
    # scheduled files; caching the whole corpus costs memory pressure
    # and fixes the task count at the cached partitioning (a 100 TB
    # corpus could never be cached anyway)
    cache_pages: bool = False
    # global-rank strategy: below this batch size a single-task window
    # sorts the (politeness-bounded) batch; above it, two-phase
    # range-partitioned ranking (operators/ordering.py).  64k keeps the
    # serial sort bounded while small rounds stay single-stage.
    big_batch_threshold: int = 1 << 16
    # hot-host salting (A14, operators/politeness.py:_salted_topk): a
    # quota-CONSTRAINED host with more than hot_host_threshold eligible
    # rows is ranked via salted two-phase top-k over n_salts salts
    # instead of one single-task host window (same admit set; tested)
    hot_host_threshold: int = 4096
    n_salts: int = 16
    # host_state joins broadcast below this many hosts (upper-bound
    # tracked in snapshot lineage); above it they fall back to a
    # co-partitioned shuffle join — a broadcast hash relation of 10^8
    # hosts per round won't fit executor memory
    broadcast_hosts_threshold: int = 5_000_000
