"""Spark-engine tests: expression parity with the pure functions,
e2e differential vs the oracle, exact resume, cuckoo on/off
equivalence (SURVEY.md §5.3 e2e + property layers)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from beeradvocate_crawler_spark.config import CrawlConfig
from beeradvocate_crawler_spark.fixtures import site_model as sm
from beeradvocate_crawler_spark.fixtures.gen_site import write_pages_parquet
from beeradvocate_crawler_spark.operators.links import classify_expr
from beeradvocate_crawler_spark.plans import crawl as plans
from beeradvocate_crawler_spark.testing import compare


@pytest.fixture(scope="module")
def site_dirs(spark, smoke_site):
    tmp = tempfile.mkdtemp(prefix="ba_spark_test_")
    pages_path = f"{tmp}/pages"
    write_pages_parquet(spark, "smoke", pages_path)
    yield tmp, pages_path
    shutil.rmtree(tmp, ignore_errors=True)


class TestExpressionParity:
    def test_xxhash64_matches_pure(self, spark, smoke_site):
        from beeradvocate_crawler_spark.functions.xxh64 import xxh64_signed

        pages, _, _ = smoke_site
        urls = [p["url"] for p in pages[:50]]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r["url"]: r["h"] for r in df.select("url", F.xxhash64("url").alias("h")).collect()}
        assert got == {u: xxh64_signed(u) for u in urls}

    def test_classifier_matches_pure(self, spark, smoke_site):
        from beeradvocate_crawler_spark.functions.urlnorm import classify_url

        pages, _, _ = smoke_site
        urls = [p["url"] for p in pages] + [
            "https://ba.example/beer/profile/1/101/?start=25&view=beer",
            "https://x.example/nothing",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r["url"]: r["t"] for r in df.select("url", classify_expr(F.col("url")).alias("t")).collect()}
        assert got == {u: classify_url(u) for u in urls}


class TestCorpusMeta:
    def test_sparse_residues_no_false_404(self, spark):
        """files_per_bucket larger than the page count leaves most
        residues unoccupied; pruning keyed off the sidecar moduli must
        still find every page (the max(file_in_bucket)+1 inference this
        replaces would prune the wrong files here)."""
        from datetime import datetime

        from beeradvocate_crawler_spark.fixtures.gen_site import pages_schema
        from beeradvocate_crawler_spark.operators.fetch import fetch_join
        from beeradvocate_crawler_spark.operators.links import (
            classify_expr as ce,
            host_expr,
        )
        from beeradvocate_crawler_spark.sources.corpus import (
            read_corpus_meta,
            write_corpus_meta,
        )

        rows = [
            {
                "url": f"https://ba.example/beer/profile/{i}/",
                "warc_ts": datetime(2024, 1, 1),
                "html": b"<html>x</html>",
                "text": "x",
                "lang": "en",
            }
            for i in range(10)
        ]
        tmp = tempfile.mkdtemp(prefix="ba_sparse_")
        pages_path = f"{tmp}/pages"
        fpb = 97  # >> 10 pages: top residue certainly unoccupied
        df = spark.createDataFrame(rows, schema=pages_schema())
        (
            df.withColumn(
                "bucket",
                F.pmod(F.xxhash64(F.parse_url("url", F.lit("HOST"))), F.lit(16)),
            )
            .withColumn("file_in_bucket", F.pmod(F.xxhash64("url"), F.lit(fpb)))
            .write.mode("overwrite")
            .partitionBy("bucket", "file_in_bucket")
            .parquet(pages_path)
        )
        write_corpus_meta(pages_path, 16, fpb)
        assert read_corpus_meta(pages_path) == {
            "n_buckets": 16,
            "files_per_bucket": fpb,
        }
        pages = spark.read.parquet(pages_path)
        sched = spark.createDataFrame(
            [(r["url"],) for r in rows], "url string"
        ).select(
            "url", ce(F.col("url")).alias("page_type"),
            host_expr(F.col("url")).alias("host"),
        )
        fetched = fetch_join(sched, pages, 16, batch_rows=10, files_per_bucket=fpb)
        got = {r["url"]: r["html"] for r in fetched.collect()}
        assert len(got) == 10 and all(v is not None for v in got.values())
        shutil.rmtree(tmp, ignore_errors=True)

    def test_bucket_modulus_mismatch_raises(self, spark, site_dirs):
        tmp, pages_path = site_dirs
        with pytest.raises(ValueError, match="n_buckets"):
            plans.run(
                spark, pages_path, sm.SEED_URLS, f"{tmp}/run_mismatch",
                CrawlConfig(round_seconds=16, n_page_buckets=8),
            )


class TestE2EDifferential:
    def test_engine_matches_oracle_exactly(self, spark, smoke_site, site_dirs):
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_e2e"
        # cuckoo_min_seen_rows=0 forces the probe path even at smoke
        # scale, so the differential covers the full cuckoo pipeline
        plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                  CrawlConfig(round_seconds=16, cuckoo_min_seen_rows=0))
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)

    def test_resume_equivalence(self, spark, smoke_site, site_dirs):
        """run(N rounds) + resume == run-to-completion, bit-identical."""
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_resume"
        cat = plans.run(
            spark, pages_path, sm.SEED_URLS, run_dir,
            CrawlConfig(round_seconds=16), max_rounds=4,
        )
        assert cat.latest().round == 4
        plans.resume(spark, pages_path, run_dir)
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)

    def test_resume_detects_corrupt_partition(self, spark, smoke_site, site_dirs):
        """A19 lineage: truncate one part file of the newest round's
        seen delta; resume must detect it via the manifest's per-file
        inventory, roll back to the previous snapshot, deterministically
        re-run the lost round, and still match the oracle exactly."""
        import os

        from beeradvocate_crawler_spark.sources.catalog import SnapshotCatalog

        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_corrupt"
        cat = plans.run(
            spark, pages_path, sm.SEED_URLS, run_dir,
            CrawlConfig(round_seconds=16), max_rounds=4,
        )
        m = cat.latest()
        last = m.round
        victims = [
            fe["path"] for fe in m.tables["seen"]["files"]
            if fe["path"].startswith(f"seen/r={last:06d}")
        ]
        assert victims, "expected a seen delta in the last round"
        victim = os.path.join(run_dir, victims[0])
        with open(victim, "r+b") as f:
            f.truncate(max(os.path.getsize(victim) // 2, 1))

        cat2 = SnapshotCatalog(spark, run_dir)
        assert cat2.validate(), "corruption must be visible to validate()"
        plans.resume(spark, pages_path, run_dir)
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)

    def test_cuckoo_off_equivalence(self, spark, smoke_site, site_dirs):
        """The cuckoo pre-filter is a pruning accelerator only — outputs
        with it disabled are identical (SURVEY.md §7.1 exactness layering)."""
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_nocuckoo"
        plans.run(
            spark, pages_path, sm.SEED_URLS, run_dir,
            CrawlConfig(round_seconds=16, use_cuckoo=False),
        )
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)

    def test_two_phase_rank_equivalence(self, spark, smoke_site, site_dirs):
        """Force the big-batch two-phase global rank path; results must
        be identical to the single-window path (§4.2 total order)."""
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_twophase"
        plans.run(
            spark, pages_path, sm.SEED_URLS, run_dir,
            CrawlConfig(round_seconds=16, big_batch_threshold=0),
        )
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)

    def test_salted_and_shuffle_host_paths_equivalence(
        self, spark, smoke_site, site_dirs
    ):
        """Force BOTH physical fallbacks at once — hot-host salted
        two-phase admission (A14, hot_host_threshold=0 makes every
        constrained host 'hot') and shuffle host_state joins
        (broadcast_hosts_threshold=0) — outputs must stay exact."""
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_salted"
        plans.run(
            spark, pages_path, sm.SEED_URLS, run_dir,
            CrawlConfig(round_seconds=16, hot_host_threshold=0, n_salts=4,
                        broadcast_hosts_threshold=0),
        )
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)


class TestDistributedFixtureGen:
    def test_pages_df_equals_driver_generator(self, spark, smoke_site):
        """Distributed mapInPandas corpus render == the sequential
        driver-side generator, byte-for-byte (url, warc_ts, html, text,
        lang) — so bench-scale corpora are trustworthy fixtures."""
        from beeradvocate_crawler_spark.fixtures.gen_site import (
            generate_pages,
            pages_df,
        )

        want = {
            p["url"]: (p["warc_ts"], p["html"], p["text"], p["lang"])
            for p in generate_pages("smoke")
        }
        got_rows = pages_df(spark, "smoke").collect()
        got = {
            r["url"]: (r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
            for r in got_rows
        }
        assert len(got_rows) == len(want)  # no dup urls
        assert got == want


class TestMissingPages404:
    def test_engine_matches_oracle_with_404s(self, spark, smoke_site):
        """Corpus with holes: a beer page, a user page, and one noise
        host's robots.txt are absent -> fetches 404, robots falls back
        to ALLOW_ALL, pagination of the missing beer never expands —
        the engine must match the oracle on the degraded corpus too."""
        import tempfile

        from beeradvocate_crawler_spark import oracle
        from beeradvocate_crawler_spark.fixtures.gen_site import (
            generate_pages,
            pages_schema,
        )
        from beeradvocate_crawler_spark.testing import compare

        from beeradvocate_crawler_spark.functions.urlnorm import classify_url

        pages = generate_pages("smoke")
        by_type: dict[str, list[str]] = {}
        for p in pages:
            by_type.setdefault(classify_url(p["url"]), []).append(p["url"])
        # one beer page, one user page, one robots (deterministic picks)
        drop = {
            sorted(by_type["beer"])[0],
            sorted(by_type["user"])[0],
            "https://noise0.example/robots.txt",
        }
        kept = [p for p in pages if p["url"] not in drop]
        corpus = {p["url"]: p for p in kept}
        ores = oracle.crawl(corpus, sm.SEED_URLS, round_seconds=16)

        tmp = tempfile.mkdtemp(prefix="ba_404_")
        pages_path = f"{tmp}/pages"
        from pyspark.sql import functions as SF

        df = spark.createDataFrame(kept, schema=pages_schema())
        (
            df.withColumn(
                "bucket",
                SF.pmod(SF.xxhash64(SF.parse_url("url", SF.lit("HOST"))), SF.lit(16)),
            )
            .withColumn("file_in_bucket", SF.pmod(SF.xxhash64("url"), SF.lit(4)))
            .repartition(8)
            .write.mode("overwrite")
            .partitionBy("bucket", "file_in_bucket")
            .parquet(pages_path)
        )
        from beeradvocate_crawler_spark.sources.corpus import write_corpus_meta

        write_corpus_meta(pages_path, 16, 4)
        plans.run(spark, pages_path, sm.SEED_URLS, f"{tmp}/run",
                  CrawlConfig(round_seconds=16))
        errs = compare(spark, f"{tmp}/run", ores, corpus)
        assert not errs, "\n".join(errs)


class TestTimeTravel:
    def test_manifest_for_round_reconstructs_history(
        self, spark, smoke_site, site_dirs
    ):
        """Time travel by round (catalog.py manifest_for_round, the
        Iceberg-snapshot semantics SURVEY §7.4 claims): reading the
        tables through EVERY historical manifest must reproduce the
        sequential oracle's state as of that round — ledger == oracle
        crawl_order truncated at r, seen grows monotonically to the
        oracle's final set, pending frontier ⊆ seen and disjoint from
        the already-fetched ledger, and each old manifest still passes
        file-level validation (old snapshots are immutable)."""
        from beeradvocate_crawler_spark.sources.catalog import SnapshotCatalog

        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_tt"
        plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                  CrawlConfig(round_seconds=16))
        cat = SnapshotCatalog(spark, run_dir)
        last = cat.latest().round
        assert last == ores.rounds

        prev_seen: set | None = None
        for r in range(1, last + 1):
            m = cat.manifest_for_round(r)
            assert m.round == r
            assert cat.validate(m) == []

            df = cat.read("crawl_order", m)
            order = (
                []
                if df is None
                else [(x["rank"], x["round"], x["url"])
                      for x in df.orderBy("rank").collect()]
            )
            assert order == [t for t in ores.crawl_order if t[1] <= r], (
                f"ledger at round {r} is not the oracle prefix"
            )

            seen = {x["url"] for x in cat.read("seen", m).collect()}
            if prev_seen is not None:
                assert prev_seen <= seen, f"seen shrank at round {r}"
            prev_seen = seen

            fr = cat.read("frontier", m)
            pend = set() if fr is None else {x["url"] for x in fr.collect()}
            assert pend <= seen, f"pending url not in seen at round {r}"
            assert not pend & {u for _, _, u in order}, (
                f"pending url already fetched at round {r}"
            )

        assert prev_seen == ores.seen


class TestCommitConcurrency:
    """Optimistic-concurrency commit protocol (catalog.py): the Iceberg
    semantics that two writers on one run dir cannot silently clobber
    each other.  No Spark jobs — commit_round with nothing staged
    carries tables forward, which is all the protocol needs."""

    def _cat(self, spark, d):
        from beeradvocate_crawler_spark.sources.catalog import SnapshotCatalog

        return SnapshotCatalog(spark, d)

    def test_racing_writers_second_commit_fails(self, spark):
        from beeradvocate_crawler_spark.sources.catalog import (
            CommitConflictError,
        )

        d = tempfile.mkdtemp(prefix="ba_cc_")
        a = self._cat(spark, d)
        a.commit_round(0)
        b = self._cat(spark, d)  # base = round 0, same as a
        b.commit_round(1)  # b wins round 1
        with pytest.raises(CommitConflictError, match="staged against"):
            a.commit_round(1)  # a must NOT clobber b's round 1
        with pytest.raises(CommitConflictError):
            a.commit_round(2)  # nor commit past a snapshot it never saw
        assert self._cat(spark, d).latest().round == 1
        shutil.rmtree(d, ignore_errors=True)

    def test_round_numbers_monotone_not_contiguous(self, spark):
        """Round numbers may jump FORWARD (a starved round fast-forwards
        past its no-op successors and commits at the skipped-to round);
        they must never go backward, and amending one's own current
        round stays sanctioned."""
        from beeradvocate_crawler_spark.sources.catalog import (
            CommitConflictError,
        )

        d = tempfile.mkdtemp(prefix="ba_cc_")
        a = self._cat(spark, d)
        a.commit_round(0)
        a.commit_round(2)  # forward jump: sanctioned (fast-forward)
        with pytest.raises(CommitConflictError):
            a.commit_round(1)  # backward: never
        a.commit_round(2)  # amending one's own current round is fine
        a.commit_round(3)  # sequential is fine
        shutil.rmtree(d, ignore_errors=True)

    def test_live_lock_holder_conflicts_dead_lock_cleared(self, spark):
        import json as J
        import os as O

        from beeradvocate_crawler_spark.sources.catalog import (
            CommitConflictError,
        )

        d = tempfile.mkdtemp(prefix="ba_cc_")
        a = self._cat(spark, d)
        lock = O.path.join(d, "_COMMIT_LOCK")
        # live holder (this process) -> genuine conflict
        with open(lock, "w") as f:
            J.dump({"pid": O.getpid(), "round": 0}, f)
        with pytest.raises(CommitConflictError, match="lock"):
            a.commit_round(0)
        O.unlink(lock)
        # dead holder -> stale lock is cleared and the commit proceeds
        with open(lock, "w") as f:
            J.dump({"pid": 2**22 + 7, "round": 0}, f)  # beyond pid_max
        a.commit_round(0)
        assert not O.path.exists(lock)
        shutil.rmtree(d, ignore_errors=True)

    def test_resume_after_rollback_still_commits(self, spark, smoke_site, site_dirs):
        """The CAS check must not break the sanctioned re-commit flows:
        rollback_to_valid -> re-run lost rounds, and resume's
        seen_filter amend of its own round."""
        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_cc_resume"
        plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                  CrawlConfig(round_seconds=16), max_rounds=3)
        cat = self._cat(spark, run_dir)
        # corrupt the newest snapshot's frontier file -> rollback territory
        m = cat.latest()
        fe = m.tables["frontier"]["files"][0]
        p = f"{run_dir}/{fe['path']}"
        with open(p, "r+b") as f:
            f.truncate(max(1, fe["bytes"] // 2))
        plans.resume(spark, pages_path, run_dir)
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)


class TestCatalogMaintenance:
    """compact_table + expire_snapshots (catalog.py): the Iceberg
    rewrite_data_files / expire_snapshots analogues that keep the
    append-only tables' file lists bounded over thousands of rounds."""

    def test_compact_preserves_data_and_time_travel(self, spark):
        from beeradvocate_crawler_spark.sources.catalog import (
            DELTA,
            SnapshotCatalog,
        )

        d = tempfile.mkdtemp(prefix="ba_cm_")
        cat = SnapshotCatalog(spark, d)
        for r in range(3):
            df = spark.range(r * 10, r * 10 + 10).withColumnRenamed("id", "v")
            cat.write_round("t", df, r, DELTA, skip_if_empty=False, n_rows=10)
            cat.commit_round(r)
        assert len(cat.latest().tables["t"]["paths"]) == 3
        cat.compact_table("t", target_files=2)
        m = cat.latest()
        assert m.round == 2  # amend, not a new round
        assert len(m.tables["t"]["paths"]) == 1
        assert cat.validate(m) == []
        got = sorted(x["v"] for x in cat.read("t").collect())
        assert got == list(range(30))
        # time travel to PRE-compaction manifests still reads old dirs
        old = sorted(
            x["v"] for x in cat.read("t", cat.manifest_for_round(1)).collect()
        )
        assert old == list(range(20))
        # a later delta appends on top of the compacted base
        cat.write_round("t", spark.range(30, 35).withColumnRenamed("id", "v"),
                        3, DELTA, skip_if_empty=False, n_rows=5)
        cat.commit_round(3)
        assert sorted(x["v"] for x in cat.read("t").collect()) == list(range(35))
        shutil.rmtree(d, ignore_errors=True)

    def test_expire_reclaims_unreferenced_dirs(self, spark):
        import os as O

        from beeradvocate_crawler_spark.sources.catalog import (
            DELTA,
            SnapshotCatalog,
        )

        d = tempfile.mkdtemp(prefix="ba_ex_")
        cat = SnapshotCatalog(spark, d)
        for r in range(4):
            df = spark.range(r * 10, r * 10 + 10).withColumnRenamed("id", "v")
            cat.write_round("t", df, r, DELTA, skip_if_empty=False, n_rows=10)
            cat.commit_round(r)
        cat.compact_table("t", target_files=1)
        stats = cat.expire_snapshots(keep_last=1)
        assert stats["manifests_removed"] == 3
        assert stats["dirs_removed"] == 4  # the four superseded deltas
        assert sorted(O.listdir(O.path.join(d, "t"))) == ["r=000003c"]
        m = cat.latest()
        assert cat.validate(m) == []
        assert sorted(x["v"] for x in cat.read("t").collect()) == list(range(40))
        with pytest.raises(FileNotFoundError):
            cat.manifest_for_round(0)  # expired — time travel horizon moved
        shutil.rmtree(d, ignore_errors=True)

    def test_maintenance_mid_crawl_then_resume_matches_oracle(
        self, spark, smoke_site, site_dirs
    ):
        """Compaction + expiry between run legs must not disturb exact
        resume: the resumed crawl still reproduces the oracle."""
        from beeradvocate_crawler_spark.sources.catalog import SnapshotCatalog

        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_maint"
        plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                  CrawlConfig(round_seconds=16), max_rounds=3)
        cat = SnapshotCatalog(spark, run_dir)
        for t in ("seen", "frontier_log", "crawl_order", "parsed"):
            if cat.latest().tables.get(t, {}).get("paths"):
                cat.compact_table(t, target_files=2)
        cat.expire_snapshots(keep_last=1)
        plans.resume(spark, pages_path, run_dir)
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)


class TestPipelinedCommitCrash:
    def test_crash_between_bg_submit_and_pointer_swap_resumes_cleanly(
        self, spark, smoke_site, site_dirs
    ):
        """Round-4 VERDICT ask #9: the pipelined background commit is
        the newest concurrency surface.  Simulate a crash AFTER round
        r's state writes are staged but BEFORE its manifest pointer
        swap (commit_round raises from the background thread), verify
        the failure propagates at the next round's commit barrier with
        round r-1 still the catalog head, and that plain resume()
        re-runs r..end to the exact oracle state — staged-but-
        uncommitted files from the dead round must be invisible."""
        from beeradvocate_crawler_spark.sources.catalog import SnapshotCatalog

        _, corpus, ores = smoke_site
        tmp, pages_path = site_dirs
        run_dir = f"{tmp}/run_crash_swap"

        class Crash(RuntimeError):
            pass

        orig = SnapshotCatalog.commit_round
        crash_round = 3

        def dying(self, rnd, *a, **k):
            if rnd == crash_round:
                raise Crash(f"simulated death before round-{rnd} pointer swap")
            return orig(self, rnd, *a, **k)

        SnapshotCatalog.commit_round = dying
        try:
            with pytest.raises(Crash):
                plans.run(spark, pages_path, sm.SEED_URLS, run_dir,
                          CrawlConfig(round_seconds=16))
        finally:
            SnapshotCatalog.commit_round = orig

        # catalog head must still be the last committed round (r-1)
        cat = SnapshotCatalog(spark, run_dir)
        assert cat.latest().round == crash_round - 1

        plans.resume(spark, pages_path, run_dir)
        errs = compare(spark, run_dir, ores, corpus)
        assert not errs, "\n".join(errs)
