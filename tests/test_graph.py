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


def _pure_hits(edges: list[tuple[str, str]], iters: int, scale: int):
    hub = {s: scale for s, _ in edges}
    auth: dict[str, int] = {}
    for _ in range(iters):
        auth = {}
        for s, d in edges:
            auth[d] = auth.get(d, 0) + hub[s]
        m = max(auth.values())
        auth = {d: (v * scale) // m for d, v in auth.items()}
        hub = {}
        for s, d in edges:
            hub[s] = hub.get(s, 0) + auth[d]
        m = max(hub.values())
        hub = {s: (v * scale) // m for s, v in hub.items()}
    return hub, auth


def test_integer_hits_matches_pure_twin(spark):
    """The registered HITS query's scores on the real sf0.001 graph
    must match the pure recurrence run on the same collected edge
    list — catches any Spark-side renormalization or join drift."""
    from beeradvocate_crawler_spark.plans import graph as G
    from beeradvocate_crawler_spark.plans.textops import release_caches

    sf = "/root/testdata/sf0.001"
    try:
        edges = [(r["src"], r["dst"]) for r in G._fwd_edges(spark, sf).collect()]
        hub, auth = _pure_hits(edges, G._HITS_ITERS, G._HITS_SCALE)
        got = G.q_hits_links(spark, sf).collect()
    finally:
        release_caches()
    assert len(got) == 20
    for r in got:
        want = auth if r["kind"] == "auth" else hub
        assert want[r["node"]] == r["score"], r
    # ranks well-formed per kind, scores descending
    for kind in ("auth", "hub"):
        rows = [r for r in got if r["kind"] == kind]
        assert [r["rnk"] for r in rows] == list(range(1, 11))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # the top of each list is the renormalization fixpoint: score == scale
    assert max(r["score"] for r in got) == G._HITS_SCALE


def test_seed_distance_matches_pure_bfs(spark):
    """Capped BFS distances on the real sf0.001 graph vs a pure-Python
    BFS over the same collected (symmetrized) edges."""
    from beeradvocate_crawler_spark.plans import graph as G
    from beeradvocate_crawler_spark.plans.textops import release_caches

    sf = "/root/testdata/sf0.001"
    try:
        fwd = [(r["src"], r["dst"]) for r in G._fwd_edges(spark, sf).collect()]
        got = {r["dist"]: (r["n_nodes"], r["min_node"], r["max_node"])
               for r in G.q_seed_distance(spark, sf).collect()}
    finally:
        release_caches()
    adj: dict[str, set] = {}
    for s, d in fwd:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in G._BFS_SEEDS if s in adj}
    frontier = list(dist)
    for depth in range(1, G._BFS_SWEEPS + 1):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = depth
                    nxt.append(m)
        frontier = nxt
    want: dict[int, list] = {}
    for n, d in dist.items():
        want.setdefault(d, []).append(n)
    assert got == {
        d: (len(ns), min(ns), max(ns)) for d, ns in want.items()
    }


def _pure_pagerank_fixpoint(edges, tol=16, max_sweeps=64):
    """Pure-Python twin of graph.pagerank_fixpoint: same recurrence,
    same integer stop rule, so the sweep COUNT must match too."""
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: _INIT for n in outdeg}
    for sweep in range(1, max_sweeps + 1):
        nxt: dict[str, int] = {}
        for s, d in edges:
            nxt[d] = nxt.get(d, 0) + (pr[s] * 85) // (100 * outdeg[s])
        new_pr = {n: _KEEP + v for n, v in nxt.items()}
        keys = set(pr) | set(new_pr)
        delta = max(abs(new_pr.get(k, 0) - pr.get(k, 0)) for k in keys)
        pr = new_pr
        if delta <= tol:
            return pr, sweep
    raise RuntimeError("pure twin did not converge")


def test_pagerank_fixpoint_converges_to_stationary_masses(spark):
    """VERDICT round-4 ask #6: production fixpoint mode — iterate until
    integer masses are stable (not a fixed 3 sweeps) — must converge on
    a star+chain fixture to EXACTLY the pure twin's masses and sweep
    count under the same integer stop rule."""
    from beeradvocate_crawler_spark.plans import graph as G
    from beeradvocate_crawler_spark.plans.textops import release_caches

    fwd = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a")]
    both = fwd + [(d, s) for s, d in fwd]
    df = spark.createDataFrame(both, "src string, dst string")
    pr_df, n_sweeps = G.pagerank_fixpoint(df, tol_micro=16, max_sweeps=64)
    got = {r["node"]: r["pr"] for r in pr_df.collect()}
    release_caches()
    want, want_sweeps = _pure_pagerank_fixpoint(both)
    assert got == want
    assert n_sweeps == want_sweeps
    assert n_sweeps > 3  # genuinely deeper than the fixed-sweep grid twin


def test_hits_fixpoint_converges_and_matches_pure_twin(spark):
    from beeradvocate_crawler_spark.plans import graph as G
    from beeradvocate_crawler_spark.plans.textops import release_caches

    fwd = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a2"),
           ("h3", "a3"), ("a1", "a3")]
    df = spark.createDataFrame(fwd, "src string, dst string")
    auth_df, hub_df, n_sweeps = G.hits_fixpoint(df, tol_micro=16)
    got_a = {r["dst"]: r["a"] for r in auth_df.collect()}
    got_h = {r["src"]: r["h"] for r in hub_df.collect()}
    release_caches()

    # pure twin: same half-sweep + L-inf renorm + stop rule
    hub = {s: G._HITS_SCALE for s, _ in fwd}
    auth = None
    for sweep in range(1, 65):
        araw: dict[str, int] = {}
        for s, d in fwd:
            araw[d] = araw.get(d, 0) + hub.get(s, 0)
        amax = max(araw.values())
        new_auth = {d: v * G._HITS_SCALE // amax for d, v in araw.items()}
        hraw: dict[str, int] = {}
        for s, d in fwd:
            hraw[s] = hraw.get(s, 0) + new_auth.get(d, 0)
        hmax = max(hraw.values())
        new_hub = {s: v * G._HITS_SCALE // hmax for s, v in hraw.items()}
        if auth is not None:
            da = max(abs(new_auth.get(k, 0) - auth.get(k, 0))
                     for k in set(auth) | set(new_auth))
            dh = max(abs(new_hub.get(k, 0) - hub.get(k, 0))
                     for k in set(hub) | set(new_hub))
            auth, hub = new_auth, new_hub
            if da <= 16 and dh <= 16:
                break
        else:
            auth, hub = new_auth, new_hub
    assert got_a == auth
    assert got_h == hub
    assert n_sweeps == sweep
