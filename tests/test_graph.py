"""Web-graph analytics (SURVEY.md §2.E G1): the Spark fixed-point
integer PageRank must agree with an independent pure-Python
implementation of the same recurrence on a crafted graph — the same
pure-twin strategy the xxhash64/classifier expressions use."""

from __future__ import annotations

from pyspark.sql import functions as F

from beeradvocate_crawler_spark.plans.graph import _INIT, _ITERS, _KEEP


def _pure_pagerank(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    both = edges + [(d, s) for s, d in edges]
    outdeg: dict[str, int] = {}
    for s, _ in both:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: _INIT for n in outdeg}
    for _ in range(iters):
        nxt = {n: 0 for n in outdeg}
        for s, d in both:
            nxt[d] += (pr[s] * 85) // (100 * outdeg[s])
        pr = {n: _KEEP + v for n, v in nxt.items()}
    return pr


def test_integer_pagerank_matches_pure_twin(spark):
    """Star + chain + isolated pair: hub c1 must out-rank everything,
    and every node's mass must match the pure recurrence exactly."""
    from beeradvocate_crawler_spark.plans import graph as G

    edges = [
        ("c1", "s1"), ("c1", "s2"), ("c1", "s3"),  # hub
        ("c2", "s3"), ("c3", "s3"),                # chain into s3
        ("c4", "s4"),                               # isolated pair
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")

    # drive the same sweep loop the query runs, on the crafted edges
    both = edf.unionByName(
        edf.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count("*").alias("outdeg"))
    pr = deg.select("src", F.lit(_INIT).cast("long").alias("pr"))
    for _ in range(_ITERS):
        contrib = both.join(pr.join(deg, "src"), "src").select(
            F.col("dst"), F.expr("pr * 85 div (100 * outdeg)").alias("c")
        )
        pr = (
            contrib.groupBy("dst")
            .agg((F.lit(_KEEP) + F.sum("c")).cast("long").alias("pr"))
            .select(F.col("dst").alias("src"), "pr")
        )
    got = {r["src"]: r["pr"] for r in pr.collect()}
    want = _pure_pagerank(edges, _ITERS)
    assert got == want
    # the two degree-3 hubs (c1, s3 — symmetric) tie and out-rank the
    # degree-1 isolated pair
    assert got["c1"] == got["s3"] > got["s4"]

    # and the registered query returns a well-formed ranked top-20
    out = G.q_pagerank_links(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 20
    assert [r["rnk"] for r in out] == list(range(1, 21))
    masses = [r["pr"] for r in out]
    assert masses == sorted(masses, reverse=True)
