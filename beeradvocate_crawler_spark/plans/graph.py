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


def _edges(spark, sf):
    """Symmetrized customer↔supplier edge list (distinct), namespaced
    node ids ('c…'/'s…').  Symmetrization guarantees outdeg ≥ 1 and
    in-edges for every node — no dangling-mass bookkeeping."""
    li = ld(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    od = ld(spark, sf, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def q_pagerank_links(spark, sf):
    """G1: 3 sweeps of fixed-point integer PageRank (d=0.85) over the
    symmetrized customer↔supplier graph; top-20 nodes by final mass.

    Integer mass → bit-identical in Spark and DuckDB (module doc).
    ``outdeg`` is folded INTO the persisted edge list once (an edge's
    source degree is sweep-invariant), so each sweep is exactly one
    shuffle join (rank vector ⋈ edges on ``src``) plus one hash-agg on
    ``dst`` — not the two joins the naive pr⋈deg⋈edges shape pays; the
    edge list is persisted hash-partitioned on ``src`` so all sweeps
    reuse one partitioning."""
    edges0 = _scoped_persist(_edges(spark, sf).repartition("src"))
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
