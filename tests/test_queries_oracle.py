"""Driver-harness replica over a representative queries() subset at
sf0.001: row count + column names + order-insensitive value hash vs
DuckDB (the full set is exercised by scripts/check_queries.py and the
driver itself at sf0.01)."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# fast + representative: one per operator family
SUBSET = [
    "tpch_q1", "full_outer_join", "semi_anti_join", "asof_latest_event",
    "grouping_analytics", "window_rank_orders", "window_lag_runsum",
    "collect_sorted", "string_hash_funcs",
    "array_hof", "json_extract", "pandas_udf_canonicalize",
    "grouped_map_zscore", "grouped_agg_p95", "map_in_pandas_tokens",
    "classify_urls", "pagination_expand", "frontier_merge",
    "dedup_exact", "ngram_jaccard_pairs", "minhash_lsh_dedup", "simhash",
    "near_dup_keep", "near_dup_keep_cc", "ann_exact_ivf", "token_count_bpe",
    "pagerank_links", "embedding_neardup", "lang_id", "quality_score",
    "doc_fingerprint", "multimodal_meta", "multimodal_frames",
    "split_quota_sample", "decontaminate",
    "repetition_filter", "tfidf_top_terms", "sessionize",
    # round-5 additions: RFC 9309 matcher, paragraph dedup, PII scrub,
    # per-source crawl-ops analytics
    "robots_match", "paragraph_dedup", "pii_redact", "host_stats",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode() + b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as E

    return E


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, spark, duck, entrymod):
    df = entrymod.queries()[name](spark, SF_DIR)
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.collect()]
    res = duck.sql(entrymod.oracle_sql()[name])
    ocols = [c.lower() for c in res.columns]
    orows = res.fetchall()
    assert sorted(cols) == sorted(ocols)
    assert len(rows) == len(orows)
    assert _vhash(cols, rows) == _vhash(ocols, orows)


def test_every_query_has_unique_name(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 45
    extra_sql = set(entrymod.oracle_sql()) - set(qs)
    assert not extra_sql, f"oracle_sql keys without queries: {extra_sql}"
