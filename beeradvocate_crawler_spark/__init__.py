"""PySpark-native crawl-analytics engine (from scratch, NOT a port).

Reimplements the semantics of the BeerAdvocate crawler pipeline
(glederrey/beeradvocate_crawler — reference mount was empty at survey
time; the normative spec is /root/repo/BASELINE.json) as a URL-frontier
+ fetch scheduler over tables of Common-Crawl-style pages, designed for
a 10^10-URL frontier on a multi-executor cluster:

- columnar DataFrames everywhere, vectorized pandas/Arrow UDFs only
  (no per-row Python UDFs in the hot path);
- deterministic crawl ordering that is invariant to parallelism
  (local[8] == local[32] == N-executor cluster);
- partitioned cuckoo-filter URL-seen pre-filter with an exact
  anti-join as the authority;
- per-host politeness token bucket + robots.txt compliance on
  logical (round) time;
- snapshot-per-round catalog with per-partition lineage for exact
  resume.

See SURVEY.md for the blueprint and citation conventions.
"""

__version__ = "0.1.0"
