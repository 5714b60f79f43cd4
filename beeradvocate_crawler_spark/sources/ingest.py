"""External page-corpus ingestion (SURVEY.md §2 C2 source formats).

Two Common-Crawl-shaped external formats land in the engine's canonical
``pages`` table (url, warc_ts, html, text, lang — BASELINE.json
input_hint shape):

- **WARC** (Common Crawl's native archive format, ISO 28500):
  ``spark.read.format("binaryFile")`` over ``.warc`` / ``.warc.gz``
  shards — one whole shard per task.  That is the correct scale unit,
  not a compromise: WARC is only splittable at gzip *member*
  boundaries, which is why CC sizes shards at ~1 GB and compresses one
  member per record; a 100 TB crawl is ~100k shards = 100k tasks.
  Records are parsed by a pure-Python scanner (Content-Length framing,
  no regex over payloads) inside ``mapInPandas`` — Arrow-batched, no
  per-row Python UDF [input_hint].  WARC carries no extracted text, so
  ``text``/``lang`` land NULL (CC publishes text separately as WET;
  the crawl itself never reads corpus text — parse extracts its own
  from html, operators/fetch.py contract).
- **JSONL(.gz)**: ``spark.read.schema(...).json`` — the native JVM
  reader: splittable, whole-stage codegen, column pruning for free.
  ``html`` rides as a UTF-8 string field (JSON has no binary type) and
  is encoded JVM-side.

``write_corpus`` then lays out the bucketed directory structure + the
sidecar moduli (sources/corpus.py contract), so ``fetch_join``'s
two-level partition pruning works unchanged over ingested corpora —
verified end-to-end by tests/test_ingest.py: a crawl over a
WARC-ingested smoke corpus is differentially equal to the oracle.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


# -- WARC ---------------------------------------------------------------------

def _gunzip_members(b: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (CC compresses one member
    per WARC record so shards are member-seekable).  A truncated final
    member yields what decompressed so far instead of raising — the
    scanner below simply finds no complete record in the tail."""
    out = []
    while b:
        d = zlib.decompressobj(47)  # gzip wrapper
        try:
            out.append(d.decompress(b))
        except zlib.error:
            break
        if not d.eof:
            break
        b = d.unused_data
    return b"".join(out)


def _iter_warc_records(data: bytes):
    """Yield (headers: dict[str, str], block: bytes) per WARC record.
    Framing comes from Content-Length — payload bytes are never
    scanned, so html containing 'WARC/' cannot desynchronize it."""
    i, n = 0, len(data)
    while i < n:
        if not data.startswith(b"WARC/", i):
            j = data.find(b"\r\nWARC/", i)
            if j < 0:
                return
            i = j + 2
        he = data.find(b"\r\n\r\n", i)
        if he < 0:
            return
        hdrs: dict[str, str] = {}
        for ln in data[i:he].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError:
            clen = 0
        bs = he + 4
        yield hdrs, data[bs : bs + clen]
        i = bs + clen + 4  # skip the record-terminating \r\n\r\n


def _warc_date(s: str | None) -> datetime | None:
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt  # naive UTC — session timezone is UTC (session.py)


def read_pages_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shard(s) -> pages rows.  Only ``WARC-Type: response``
    records become pages; warcinfo/request/metadata records are
    skipped.  The html payload is the HTTP body (bytes after the first
    CRLFCRLF of the block); a block with no HTTP header section is
    taken whole (some writers store raw payloads)."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches):
        for pdf in batches:
            cols = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if str(p).endswith(".gz"):
                    data = _gunzip_members(data)
                for hdrs, block in _iter_warc_records(data):
                    if hdrs.get("warc-type", "").lower() != "response":
                        continue
                    url = hdrs.get("warc-target-uri")
                    if not url:
                        continue
                    body = (
                        block.split(b"\r\n\r\n", 1)[1]
                        if b"\r\n\r\n" in block
                        else block
                    )
                    cols["url"].append(url)
                    cols["warc_ts"].append(_warc_date(hdrs.get("warc-date")))
                    cols["html"].append(body)
                    cols["text"].append(None)
                    cols["lang"].append(None)
            yield pd.DataFrame(cols)

    return raw.mapInPandas(gen, PAGES_DDL)


# -- JSONL --------------------------------------------------------------------

def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines pages (html as a UTF-8 string field) -> pages rows.
    Explicit schema: no sampling pass, bad lines fail loudly instead of
    silently widening types."""
    df = spark.read.schema(
        "url string, warc_ts timestamp, html string, text string, lang string"
    ).json(path)
    return df.select(
        "url",
        "warc_ts",
        F.encode("html", "utf-8").alias("html"),
        "text",
        "lang",
    )


# -- bucketed corpus layout ----------------------------------------------------

def write_corpus(
    df: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    files_per_bucket: int | None = None,
) -> str:
    """Write pages bucketed by host hash (directory-partitioned on
    ``bucket`` so fetch-joins prune scanned files to scheduled hosts),
    spread by url-hash across FILES within each bucket: the fetch join
    inherits the scan's partitioning, so per-bucket file count — not
    bucket count — bounds fetch+parse parallelism when one hot host
    owns a bucket.  Records the moduli in the sidecar (corpus.py) —
    the fetch pruning contract."""
    from beeradvocate_crawler_spark.sources.corpus import write_corpus_meta

    spark = df.sparkSession
    files_per_bucket = files_per_bucket or max(
        64, spark.sparkContext.defaultParallelism * 2
    )
    (
        df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.parse_url("url", F.lit("HOST"))), F.lit(n_buckets)),
        )
        .withColumn(
            "file_in_bucket",
            F.pmod(F.xxhash64("url"), F.lit(files_per_bucket)),
        )
        .repartition(n_buckets * files_per_bucket, "bucket", "file_in_bucket")
        .write.mode("overwrite")
        .partitionBy("bucket", "file_in_bucket")
        .parquet(out_dir)
    )
    write_corpus_meta(out_dir, n_buckets, files_per_bucket)
    return out_dir
