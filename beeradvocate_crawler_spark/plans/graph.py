"""Web-graph analytics over the crawl's link graph (SURVEY.md §2 G1).

A frontier-scale crawler's scheduling quality depends on link-graph
signals — PageRank-style authority feeding the priority queue is the
canonical one (Page et al. 1999; the reference's priority ladder
brewery > beer > review is a hand-tuned stand-in for exactly this).
The op here computes PageRank over a bipartite customer↔supplier graph
derived from the driver's TPC-H-ish tables (the in-sandbox stand-in
for the url→url graph the crawl's ``links`` table yields at scale).

Determinism across engines AND partitionings: floating-point PageRank
is NOT reproducible across engines — the mass sums are doubles whose
addition order differs between Spark partial aggregates and DuckDB's
scan order.  So the op is **fixed-point integer PageRank**: node mass
starts at 1_000_000 micro-units, each sweep sends
``(pr * 85) div (100 * outdeg)`` micro-units along every out-edge
(integer division, exact in any engine) and every node keeps a
150_000 micro-unit teleport floor.  Every intermediate is a BIGINT, so
the driver hash-checks the result bit-for-bit — the same trick the
minhash family uses (md5→60-bit ints) applied to an iterative
algorithm.

Scale shape (100 TB link graph): each sweep is one shuffle join of the
rank vector against the edge list on ``src`` plus one hash-agg on
``dst`` — the edge list is persisted and hash-partitioned on ``src``
once, so every sweep reuses the same partitioning (exchange reuse);
nothing is ever all-pairs, and the rank vector is O(nodes) ≪ O(edges).
A fixed sweep count (3) keeps the plan static; production would loop
to an L1 fixpoint with the same per-sweep plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import ld
from .textops import _scoped_persist

_ITERS = 3
_INIT = 1_000_000  # micro-units of rank mass per node
_KEEP = 150_000    # teleport floor: (1 - 0.85) * _INIT


def _fwd_edges(spark, sf):
    """Directed customer→supplier edge list (distinct), namespaced node
    ids ('c…'/'s…') — the in-sandbox stand-in for the crawl's url→url
    link graph."""
    li = ld(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    od = ld(spark, sf, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


def _edges(spark, sf):
    """Symmetrized customer↔supplier edge list (distinct), namespaced
    node ids ('c…'/'s…').  Symmetrization guarantees outdeg ≥ 1 and
    in-edges for every node — no dangling-mass bookkeeping."""
    fwd = _fwd_edges(spark, sf)
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def q_pagerank_links(spark, sf, edges=None):
    """G1: 3 sweeps of fixed-point integer PageRank (d=0.85) over the
    symmetrized customer↔supplier graph; top-20 nodes by final mass.

    Integer mass → bit-identical in Spark and DuckDB (module doc).
    ``outdeg`` is folded INTO the persisted edge list once (an edge's
    source degree is sweep-invariant), so each sweep is exactly one
    shuffle join (rank vector ⋈ edges on ``src``) plus one hash-agg on
    ``dst`` — not the two joins the naive pr⋈deg⋈edges shape pays; the
    edge list is persisted hash-partitioned on ``src`` so all sweeps
    reuse one partitioning.

    ``edges``: optional pre-persisted src-partitioned symmetrized edge
    list — q_graph_signals builds the edge list ONCE and passes it to
    all three signal ops (round-4 VERDICT #2: the consolidated slot was
    paying the lineitem⋈orders edge build three times)."""
    edges0 = edges if edges is not None else _scoped_persist(
        _edges(spark, sf).repartition("src")
    )
    deg = edges0.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = _scoped_persist(
        edges0.join(deg, "src").select("src", "dst", "outdeg")
    )
    pr = deg.select("src", F.lit(_INIT).cast("long").alias("pr"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(pr, "src")
            .select(
                F.col("dst"),
                F.expr("pr * 85 div (100 * outdeg)").alias("c"),
            )
        )
        pr = (
            contrib.groupBy("dst")
            .agg((F.lit(_KEEP) + F.sum("c")).cast("long").alias("pr"))
            .select(F.col("dst").alias("src"), "pr")
        )
    return (
        pr.select(F.col("src").alias("node"), "pr")
        .orderBy(F.col("pr").desc(), "node")
        .limit(20)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.col("pr").desc(), "node"))
        )
    )


_SQL_EDGES = """
fwd AS (
  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
                  's' || l_suppkey::VARCHAR AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
"""

_SQL_SWEEP = """
{out} AS (
  SELECT e.dst AS src, (150000 + sum((p.pr * 85) // (100 * d.outdeg)))::BIGINT AS pr
  FROM edges e JOIN deg d USING (src) JOIN {inp} p USING (src)
  GROUP BY e.dst)
"""

SQL_PAGERANK = (
    "WITH "
    + _SQL_EDGES
    + ", pr0 AS (SELECT src, 1000000::BIGINT AS pr FROM deg)"
    + "".join(
        "," + _SQL_SWEEP.format(out=f"pr{i + 1}", inp=f"pr{i}")
        for i in range(_ITERS)
    )
    + f"""
SELECT src AS node, pr,
       row_number() OVER (ORDER BY pr DESC, src) AS rnk
FROM pr{_ITERS} ORDER BY pr DESC, node LIMIT 20
"""
)


# --- G2: integer fixed-point HITS ------------------------------------------------

_HITS_ITERS = 2
_HITS_SCALE = 1_000_000  # L-infinity renormalization target per half-sweep


def _topk_ranked(df, kind: str, score_col: str, node_col: str, k: int = 10):
    ranked = (
        df.orderBy(F.col(score_col).desc(), F.col(node_col))
        .limit(k)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col(score_col).desc(), F.col(node_col))
            ),
        )
    )
    return ranked.select(
        F.lit(kind).alias("kind"),
        F.col(node_col).alias("node"),
        F.col(score_col).cast("long").alias("score"),
        "rnk",
    )


def q_hits_links(spark, sf, fwd_edges=None):
    """G2: HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    customer→supplier graph — the second classic scheduler signal next
    to PageRank (a hub page's out-links are high-value fetches even
    when the hub itself isn't).  Returns top-10 authorities + top-10
    hubs with ranks.

    Cross-engine exactness: float HITS normalizes by an L2 norm —
    unreproducible across engines.  Here each half-sweep renormalizes
    by the CURRENT MAX via integer arithmetic, ``score * 1_000_000 div
    max(score)`` — the L∞-normalized power iteration, exact in any
    engine.  Bound: raw sums ≤ n_nodes · 1e6, so the ·1e6 product stays
    under 2^63 through ~1e6-customer graphs; beyond that the scale
    constant drops (documented, not load-bearing for ranking).

    Scale shape: each half-sweep is one shuffle join of the score
    vector against the persisted edge list + one hash-agg; the
    renormalizing max is a scalar global agg broadcast back — O(1)
    rows moved.  Same exchange-reuse story as PageRank; nothing
    all-pairs.

    ``fwd_edges``: optional pre-persisted src-partitioned directed edge
    list (see q_pagerank_links' ``edges``).  Degenerate corpora (empty
    or zero-mass edge list) yield an EMPTY result — the oracle SQL's
    behavior on the same input (ADVICE r04: the raise here diverged
    from SQL_HITS)."""
    from .textops import _scoped_local_checkpoint

    fwd = fwd_edges if fwd_edges is not None else _scoped_persist(
        _fwd_edges(spark, sf).repartition("src")
    )
    hub = fwd.select("src").distinct().select(
        "src", F.lit(_HITS_SCALE).cast("long").alias("h")
    )
    auth = None
    for _ in range(_HITS_ITERS):
        # each raw half-sweep is BRANCHED (feeds its own max AND the
        # normalize): without the eager checkpoint Catalyst recomputes
        # the whole upstream once per branch per level — 2^(2·iters)
        # blowup (measured 20.7 s vs 2.4 s at sf0.01).  The renorm max
        # is a bounded driver collect: ONE row, the sanctioned scalar
        # pattern (same as crawl.py's per-round aggregates).
        araw = _scoped_local_checkpoint(
            fwd.join(hub, "src")
            .groupBy("dst")
            .agg(F.sum("h").cast("long").alias("a"))
        )
        amax = araw.agg(F.max("a")).collect()[0][0]
        if not amax:  # None/0 on an empty edge list — converge to the
            # oracle's answer (empty result), don't let the literal end
            # up string-interpolated into F.expr as "div None"
            return spark.createDataFrame(
                [], "kind string, node string, score long, rnk int"
            )
        auth = araw.select("dst", F.expr(f"a * {_HITS_SCALE} div {amax}").alias("a"))
        hraw = _scoped_local_checkpoint(
            fwd.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum("a").cast("long").alias("h"))
        )
        hmax = hraw.agg(F.max("h")).collect()[0][0]
        if not hmax:
            return spark.createDataFrame(
                [], "kind string, node string, score long, rnk int"
            )
        hub = hraw.select("src", F.expr(f"h * {_HITS_SCALE} div {hmax}").alias("h"))
    return _topk_ranked(auth, "auth", "a", "dst").unionByName(
        _topk_ranked(hub, "hub", "h", "src")
    )


def _sql_hits() -> str:
    fwd = (
        "SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src, "
        "'s' || l_suppkey::VARCHAR AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    )
    parts = [f"WITH fwd AS ({fwd})",
             ", hub0 AS (SELECT DISTINCT src, "
             f"{_HITS_SCALE}::BIGINT AS h FROM fwd)"]
    for i in range(_HITS_ITERS):
        parts.append(f"""
, auth{i + 1}r AS (
    SELECT dst, sum(h)::BIGINT AS a FROM fwd JOIN hub{i} USING (src) GROUP BY dst)
, auth{i + 1} AS (
    SELECT dst, (a * {_HITS_SCALE} // (SELECT max(a) FROM auth{i + 1}r))::BIGINT AS a
    FROM auth{i + 1}r)
, hub{i + 1}r AS (
    SELECT src, sum(a)::BIGINT AS h FROM fwd JOIN auth{i + 1} USING (dst) GROUP BY src)
, hub{i + 1} AS (
    SELECT src, (h * {_HITS_SCALE} // (SELECT max(h) FROM hub{i + 1}r))::BIGINT AS h
    FROM hub{i + 1}r)""")
    n = _HITS_ITERS
    parts.append(f"""
SELECT * FROM (
  SELECT 'auth' AS kind, dst AS node, a AS score,
         row_number() OVER (ORDER BY a DESC, dst) AS rnk
  FROM auth{n} ORDER BY a DESC, dst LIMIT 10)
UNION ALL
SELECT * FROM (
  SELECT 'hub' AS kind, src AS node, h AS score,
         row_number() OVER (ORDER BY h DESC, src) AS rnk
  FROM hub{n} ORDER BY h DESC, src LIMIT 10)""")
    return "".join(parts)


SQL_HITS = _sql_hits()


# --- G3: BFS seed distance (crawl depth at graph scale) --------------------------

_BFS_SWEEPS = 3
_BFS_SEEDS = ("c1", "c2", "c3")


def q_seed_distance(spark, sf, edges=None):
    """G3: min-hop distance from a fixed seed set over the symmetrized
    link graph, capped at _BFS_SWEEPS (3) hops — the frontier's crawl-depth
    signal (A9's min-depth discovery merge IS one BFS sweep; this runs
    the whole BFS as an offline analytic, the thing you compute to
    audit how deep a seed list actually reaches).  Result: per-depth
    node count + min/max node id (bounded rows, hash-checkable).

    Scale shape: each sweep is one shuffle join of the O(reached)
    distance vector against the edge list + a partial-aggregated
    group-min — BFS as |diameter| distributed passes, never
    materializing paths.  Sweep tables are eagerly localCheckpoint'd
    (lineage cut — same rationale as connected_components_min_label,
    released by release_caches()).

    ``edges``: optional pre-persisted src-partitioned symmetrized edge
    list (see q_pagerank_links' ``edges``)."""
    from .textops import _scoped_local_checkpoint

    both = edges if edges is not None else _scoped_persist(
        _edges(spark, sf).repartition("src")
    )
    d = (
        both.select("src").distinct()
        .where(F.col("src").isin(*_BFS_SEEDS))
        .select(F.col("src").alias("node"), F.lit(0).cast("int").alias("dist"))
    )
    for _ in range(_BFS_SWEEPS):
        nbr = (
            both.join(d, both.src == d.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        d = _scoped_local_checkpoint(
            d.unionByName(nbr).groupBy("node").agg(F.min("dist").alias("dist"))
        )
    return (
        d.groupBy("dist")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )


def _sql_seed_distance() -> str:
    seeds = ", ".join(f"'{s}'" for s in _BFS_SEEDS)
    parts = [
        "WITH fwd AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src, "
        "'s' || l_suppkey::VARCHAR AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        ", edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)",
        f", d0 AS (SELECT DISTINCT src AS node, 0 AS dist FROM edges "
        f"WHERE src IN ({seeds}))",
    ]
    for i in range(_BFS_SWEEPS):
        parts.append(f"""
, d{i + 1} AS (
    SELECT node, min(dist) AS dist FROM (
      SELECT node, dist FROM d{i}
      UNION ALL
      SELECT e.dst AS node, p.dist + 1 AS dist
      FROM edges e JOIN d{i} p ON e.src = p.node) GROUP BY node)""")
    parts.append(f"""
SELECT dist, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM d{_BFS_SWEEPS} GROUP BY dist ORDER BY dist""")
    return "".join(parts)


SQL_SEED_DISTANCE = _sql_seed_distance()


# --- consolidated signed-grid entry: all three graph signals ---------------------

def q_graph_signals(spark, sf):
    """Union-tagged consolidation of G1+G2+G3 (PageRank, HITS, BFS seed
    distance) into ONE driver-signed grid slot — the same pattern
    textops' ann_exact_ivf uses for D6+D8 (round-3 VERDICT ask #3: the
    driver hash-signs only the first 50 queries() entries, so every
    op must ride a signed slot).  Schema normalized to
    (signal, node, score, rnk); all values from the three ops are
    preserved verbatim (BFS packs min|max node into ``node``).

    The edge list is built and persisted ONCE here and threaded into
    all three ops (round-4 VERDICT #2: each op independently ran the
    lineitem⋈orders edge-build join and persisted its own copy — ~1/3
    of the slot's 13.7 s at sf0.1 was redundant edge construction).
    The symmetrized list derives from the persisted directed one, so
    the base join executes a single time."""
    fwd = _scoped_persist(_fwd_edges(spark, sf).repartition("src"))
    both = _scoped_persist(
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition("src")
    )
    pr = q_pagerank_links(spark, sf, edges=both).select(
        F.lit("pagerank").alias("signal"),
        "node",
        F.col("pr").cast("long").alias("score"),
        F.col("rnk").cast("int").alias("rnk"),
    )
    ht = q_hits_links(spark, sf, fwd_edges=fwd).select(
        F.concat(F.lit("hits_"), F.col("kind")).alias("signal"),
        "node",
        F.col("score").cast("long").alias("score"),
        F.col("rnk").cast("int").alias("rnk"),
    )
    bf = q_seed_distance(spark, sf, edges=both).select(
        F.lit("bfs").alias("signal"),
        F.concat_ws("|", "min_node", "max_node").alias("node"),
        F.col("n_nodes").cast("long").alias("score"),
        F.col("dist").cast("int").alias("rnk"),
    )
    return pr.unionByName(ht).unionByName(bf)


SQL_GRAPH_SIGNALS = f"""
SELECT 'pagerank' AS signal, node, pr::BIGINT AS score, rnk::INT AS rnk
FROM ({SQL_PAGERANK}) pr_t
UNION ALL
SELECT 'hits_' || kind AS signal, node, score::BIGINT AS score, rnk::INT AS rnk
FROM ({SQL_HITS}) hits_t
UNION ALL
SELECT 'bfs' AS signal, min_node || '|' || max_node AS node,
       n_nodes::BIGINT AS score, dist::INT AS rnk
FROM ({SQL_SEED_DISTANCE}) bfs_t
"""


# --- production fixpoint modes (round-4 VERDICT ask #6) ---------------------------
#
# The grid entries run a FIXED sweep count so their plans (and the
# driver's oracle SQL) stay static; production runs to convergence.
# Integer masses make the fixpoint probe exact — but integer division
# can put the tail into a tiny deterministic oscillation, so the stop
# rule is max |delta| <= tol_micro (an INTEGER threshold: deterministic
# across engines/partitionings, unlike float epsilons).  Per-sweep
# shape is identical to the fixed-sweep grid twins (one join + one
# hash-agg over the persisted src-partitioned edge list); the probe
# adds one O(nodes)-vs-O(nodes) join + scalar agg, and each sweep is
# localCheckpoint'd eagerly — the same lineage-cut discipline the CC
# loop needed (textops.py: 3.9 -> 48 s/sweep without it).

def q_graph_fixpoint(spark, sf):
    """Registry entry for the production fixpoint modes: run integer
    PageRank (symmetrized graph) and integer HITS (directed graph) TO
    CONVERGENCE (tol 16 micro-units) instead of the grid twins' fixed
    sweep counts; returns top-10 per signal, union-tagged
    (signal, node, score, rnk, sweeps).  Iterative-until-delta is not
    single-pass SQL, so this is a sanctioned rows-only entry [E:36–37];
    the masses themselves are deterministic integers and the pure-
    Python twins pin them (tests/test_graph.py).

    Tolerance is scale-appropriate, not the twins' 16 micro-units: with
    d=0.85 the max-delta contracts by ~0.85/sweep (measured at sf0.01:
    1.14e7 → 1.2e5 over 30 sweeps), so 1%-of-initial-mass (10_000)
    lands around 40 sweeps while 16 would need ~85 — rank order
    stabilizes far earlier than the last micro-unit of mass."""
    pr_df, pr_sweeps = pagerank_fixpoint(
        _edges(spark, sf), tol_micro=10_000, max_sweeps=128
    )
    auth, hub, hits_sweeps = hits_fixpoint(
        _fwd_edges(spark, sf), tol_micro=10_000, max_sweeps=128
    )
    pr10 = (
        pr_df.orderBy(F.col("pr").desc(), "node").limit(10)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.col("pr").desc(), "node"))
        )
        .select(
            F.lit("pagerank_fp").alias("signal"), "node",
            F.col("pr").cast("long").alias("score"), F.col("rnk").cast("int").alias("rnk"),
            F.lit(pr_sweeps).cast("int").alias("sweeps"),
        )
    )
    ht10 = _topk_ranked(auth, "auth_fp", "a", "dst").unionByName(
        _topk_ranked(hub, "hub_fp", "h", "src")
    ).select(
        F.col("kind").alias("signal"), "node", "score",
        F.col("rnk").cast("int").alias("rnk"),
        F.lit(hits_sweeps).cast("int").alias("sweeps"),
    )
    return pr10.unionByName(ht10)


def pagerank_fixpoint(edges, tol_micro: int = 16, max_sweeps: int = 64):
    """Iterate integer PageRank until masses are stable within
    ``tol_micro`` micro-units.  Returns ``(pr_df, n_sweeps)`` where
    pr_df has (node, pr).  Raises RuntimeError past ``max_sweeps``."""
    from .textops import _scoped_local_checkpoint, _scoped_persist

    edges0 = _scoped_persist(edges.repartition("src"))
    deg = edges0.groupBy("src").agg(F.count("*").alias("outdeg"))
    ej = _scoped_persist(edges0.join(deg, "src").select("src", "dst", "outdeg"))
    pr = _scoped_local_checkpoint(
        deg.select("src", F.lit(_INIT).cast("long").alias("pr"))
    )
    for sweep in range(1, max_sweeps + 1):
        new_pr = _scoped_local_checkpoint(
            ej.join(pr, "src")
            .select("dst", F.expr("pr * 85 div (100 * outdeg)").alias("c"))
            .groupBy("dst")
            .agg((F.lit(_KEEP) + F.sum("c")).cast("long").alias("pr"))
            .select(F.col("dst").alias("src"), "pr")
        )
        # fixpoint probe: rank vectors are O(nodes) << O(edges), so an
        # old-vs-new join + scalar agg is cheap relative to the sweep
        delta = (
            new_pr.alias("n")
            .join(pr.alias("o"), "src", "full")
            .agg(
                F.max(
                    F.abs(
                        F.coalesce(F.col("n.pr"), F.lit(0))
                        - F.coalesce(F.col("o.pr"), F.lit(0))
                    )
                ).alias("d")
            )
            .collect()[0][0]
            or 0
        )
        pr = new_pr
        if delta <= tol_micro:
            return pr.select(F.col("src").alias("node"), "pr"), sweep
    raise RuntimeError(
        f"integer PageRank did not reach |delta|<={tol_micro} in {max_sweeps} sweeps"
    )


def hits_fixpoint(fwd_edges, tol_micro: int = 16, max_sweeps: int = 64):
    """Iterate L∞-renormalized integer HITS until both hub and
    authority vectors are stable within ``tol_micro``.  Returns
    ``(auth_df, hub_df, n_sweeps)``.

    Probe folding (round-4 VERDICT nit #4): the renormalizing max is
    computed IN-DAG — a 1-row global agg broadcast-crossJoined back
    onto the raw vector — so the only driver collect per half-sweep is
    the combined delta probe (1 collect instead of the previous
    renorm-max + delta pair; 2 probe jobs/sweep instead of 4).  The
    raw half-sweep stays eagerly localCheckpoint'd (it is the branched
    expensive join+agg); the normalized projection over it is cheap to
    re-derive.  An empty/zero-mass edge list CONVERGES to empty
    auth/hub vectors (the CC loop's converge-on-empty semantics and
    q_hits_links' oracle-matching behavior) instead of raising."""
    from .textops import _scoped_local_checkpoint, _scoped_persist

    fwd = _scoped_persist(fwd_edges.repartition("src"))
    hub = _scoped_local_checkpoint(
        fwd.select("src").distinct()
        .select("src", F.lit(_HITS_SCALE).cast("long").alias("h"))
    )
    auth = None

    def _renorm_lazy(raw, col, scale):
        # in-DAG L∞ renorm: 1-row max broadcast back; no driver collect
        mx = raw.agg(F.max(col).alias("_mx"))
        key = raw.columns[0]
        return (
            raw.crossJoin(F.broadcast(mx))
            .where(F.col("_mx").isNotNull() & (F.col("_mx") != 0))
            .select(key, F.expr(f"{col} * {scale} div _mx").alias(col))
        )

    def _delta(new, old, key, col):
        # the ONE driver collect per half-sweep: max |new - old| over a
        # full outer join of two O(nodes) vectors; None on an empty
        # join (both vectors empty) counts as converged (delta 0)
        if old is None:
            return None
        d = (
            new.alias("n").join(old.alias("o"), key, "full")
            .agg(F.max(F.abs(
                F.coalesce(F.col(f"n.{col}"), F.lit(0))
                - F.coalesce(F.col(f"o.{col}"), F.lit(0))
            )).alias("d"))
            .collect()[0][0]
        )
        return 0 if d is None else d

    for sweep in range(1, max_sweeps + 1):
        araw = _scoped_local_checkpoint(
            fwd.join(hub, "src").groupBy("dst")
            .agg(F.sum("h").cast("long").alias("a"))
        )
        new_auth = _renorm_lazy(araw, "a", _HITS_SCALE)
        hraw = _scoped_local_checkpoint(
            fwd.join(new_auth, "dst").groupBy("src")
            .agg(F.sum("a").cast("long").alias("h"))
        )
        new_hub = _renorm_lazy(hraw, "h", _HITS_SCALE)
        da = _delta(new_auth, auth, "dst", "a")
        dh = _delta(new_hub, hub, "src", "h")
        auth, hub = new_auth, new_hub
        if da is not None and da <= tol_micro and dh <= tol_micro:
            return auth, hub, sweep
    raise RuntimeError(
        f"integer HITS did not reach |delta|<={tol_micro} in {max_sweeps} sweeps"
    )
