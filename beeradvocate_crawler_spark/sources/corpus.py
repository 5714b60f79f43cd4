"""Corpus sidecar metadata (SURVEY.md §2 A13 fetch pruning contract).

The fetch join's two-level partition pruning computes
``pmod(xxhash64(host), n_buckets)`` / ``pmod(xxhash64(url),
files_per_bucket)`` and must use the EXACT moduli the corpus writer
used.  Deriving ``files_per_bucket`` from the observed
``max(file_in_bucket)+1`` is wrong whenever the top residue happens to
be unoccupied (routine for small corpora: 45/64 residues occupied in
the smoke corpus) — the pruning would then silently skip the files
holding scheduled pages and the miss path would report mass false
404s.  So the writer records the moduli explicitly in a sidecar file;
the underscore prefix keeps Spark's parquet reader from touching it.
"""

from __future__ import annotations

import json
import os

CORPUS_META = "_corpus_meta.json"


def write_corpus_meta(out_dir: str, n_buckets: int, files_per_bucket: int) -> None:
    with open(os.path.join(out_dir, CORPUS_META), "w") as f:
        json.dump({"n_buckets": n_buckets, "files_per_bucket": files_per_bucket}, f)


def read_corpus_meta(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, CORPUS_META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
