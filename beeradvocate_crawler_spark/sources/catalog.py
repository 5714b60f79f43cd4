"""Iceberg-style snapshot catalog (SURVEY.md §7.4).

No lakehouse jar exists in this sandbox (SURVEY.md §0.2), so this thin
layer provides the Iceberg semantics the crawl actually needs —
snapshot isolation, delta append, per-round lineage, exact resume,
time travel by round — over plain parquet:

    run_dir/
      _SNAPSHOT                   # atomic pointer: {"round": r, "manifest": ...}
      _manifests/manifest-{r}.json
      <table>/r={r}/...parquet    # one directory per (table, round) write

Manifest (one per committed round) records, per table, the *explicit
file-list* (mode "replace" points at the latest rewrite, mode "delta"
accumulates append paths) plus row counts and free-form lineage/metrics.
Commit protocol: write parquet dirs -> write manifest json -> atomic
``os.replace`` of the pointer.  A crash between steps leaves the old
snapshot intact (exact resume, BASELINE.json north_rule).

The interface is deliberately narrow (``read / write_round /
commit_round / latest``) so a real ``iceberg-spark-runtime`` catalog
can replace it unmodified when a jar is available.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

REPLACE = "replace"
DELTA = "delta"


@dataclass
class Manifest:
    round: int
    tables: dict[str, dict[str, Any]] = field(default_factory=dict)
    lineage: dict[str, Any] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "round": self.round,
                "tables": self.tables,
                "lineage": self.lineage,
                "metrics": self.metrics,
            },
            indent=1,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        return cls(d["round"], d["tables"], d.get("lineage", {}), d.get("metrics", {}))


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        os.makedirs(os.path.join(run_dir, "_manifests"), exist_ok=True)
        self._staged: dict[str, dict[str, Any]] = {}

    # -- snapshot pointer ------------------------------------------------------
    def latest(self) -> Manifest | None:
        ptr = os.path.join(self.run_dir, "_SNAPSHOT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            p = json.load(f)
        with open(os.path.join(self.run_dir, "_manifests", p["manifest"])) as f:
            return Manifest.from_json(f.read())

    def manifest_for_round(self, r: int) -> Manifest:
        """Time travel: load the manifest committed at round r."""
        with open(os.path.join(self.run_dir, "_manifests", f"manifest-{r:06d}.json")) as f:
            return Manifest.from_json(f.read())

    # -- writes (staged, become visible only at commit) ------------------------
    def write_round(
        self,
        name: str,
        df: DataFrame,
        r: int,
        mode: str = REPLACE,
        partition_by: list[str] | None = None,
        skip_if_empty: bool = True,
        n_rows: int | None = None,
    ) -> int:
        """Write one table's round-r data; returns rows written.
        ``mode=replace``: this path becomes the table; ``mode=delta``:
        appended to the table's path list."""
        if skip_if_empty and n_rows is None:
            n_rows = df.count()
        if skip_if_empty and n_rows == 0:
            self._staged.setdefault(name, {"mode": mode, "path": None, "rows": 0})
            return 0
        path = os.path.join(self.run_dir, name, f"r={r:06d}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        self._staged[name] = {"mode": mode, "path": path, "rows": int(n_rows or -1)}
        return int(n_rows or -1)

    def commit_round(
        self,
        r: int,
        lineage: dict[str, Any] | None = None,
        metrics: dict[str, Any] | None = None,
    ) -> Manifest:
        prev = self.latest()
        m = Manifest(r, {}, lineage or {}, metrics or {})
        prev_tables = prev.tables if prev else {}
        names = set(prev_tables) | set(self._staged)
        for name in names:
            staged = self._staged.get(name)
            old = prev_tables.get(name, {})
            if staged is None:
                m.tables[name] = old  # carried forward unchanged
                continue
            if staged["mode"] == REPLACE:
                m.tables[name] = {
                    "mode": REPLACE,
                    "paths": [staged["path"]] if staged["path"] else old.get("paths", []),
                    "rows": staged["rows"],
                }
            else:
                paths = list(old.get("paths", []))
                if staged["path"]:
                    paths.append(staged["path"])
                m.tables[name] = {
                    "mode": DELTA,
                    "paths": paths,
                    "rows": old.get("rows", 0) + max(0, staged["rows"]),
                }
        mf = f"manifest-{r:06d}.json"
        with open(os.path.join(self.run_dir, "_manifests", mf), "w") as f:
            f.write(m.to_json())
        tmp = os.path.join(self.run_dir, "_SNAPSHOT.tmp")
        with open(tmp, "w") as f:
            json.dump({"round": r, "manifest": mf}, f)
        os.replace(tmp, os.path.join(self.run_dir, "_SNAPSHOT"))  # atomic
        self._staged = {}
        return m

    # -- reads -----------------------------------------------------------------
    def read_staged(self, name: str) -> DataFrame | None:
        """Read back THIS round's staged (not yet committed) write of a
        table — the write-once/read-many pattern the round loop uses for
        the fat ``parsed`` output (materialize straight to the delta
        parquet, then let downstream stages re-read it with column
        pruning instead of caching wide strings)."""
        staged = self._staged.get(name)
        if staged is None or staged["path"] is None:
            return None
        return self.spark.read.parquet(staged["path"])

    def read(self, name: str, manifest: Manifest | None = None) -> DataFrame | None:
        m = manifest or self.latest()
        if m is None or name not in m.tables:
            return None
        paths = m.tables[name].get("paths", [])
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def rows(self, name: str, manifest: Manifest | None = None) -> int:
        m = manifest or self.latest()
        if m is None or name not in m.tables:
            return 0
        return m.tables[name].get("rows", 0)
