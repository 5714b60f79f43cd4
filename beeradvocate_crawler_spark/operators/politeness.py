"""Robots compliance + per-host politeness token bucket + top-k
admission (SURVEY.md §2 A10/A11/A12).

All decisions are functions of table state and the round index only —
never wall-clock or task scheduling — which is what makes admission
deterministic and cluster-size-invariant (§4.2).  Semantics mirror
oracle.crawl step-for-step (that equivalence is the e2e differential
test).

Physical notes for the 100 TB case:
- the rules table is tiny per host and broadcast into the blocking join;
- the admission window partitions by host — the single hot host
  (ba.example by construction) makes this one fat partition.  The
  quota cap bounds it: only PENDING rows compete, and the window's
  input is pre-filtered to hosts with tokens, so the sort is
  O(pending-per-host), not O(frontier).  AQE skew-join handles the
  fetch side; parse-side salting happens in plans/crawl.py (A14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .links import path_query_expr
from .ordering import order_key

TOKEN_BURST_FACTOR = 2.0


def mark_robots_blocked(
    pending: DataFrame, host_state: DataFrame, rules: DataFrame | None
) -> DataFrame:
    """URLs of PENDING non-robots rows on robots-known hosts that the
    host's rules disallow (longest-prefix wins; tie -> Allow)."""
    known = host_state.filter(F.col("robots_done")).select("host")
    cand = (
        pending.filter(F.col("page_type") != "robots")
        .join(F.broadcast(known), "host")
        .select("url", "host", path_query_expr(F.col("url")).alias("pq"))
    )
    if rules is None:
        return cand.select("url").limit(0)
    matched = cand.join(
        F.broadcast(rules), on=["host"], how="inner"
    ).where(F.col("pq").startswith(F.col("prefix")))
    w = Window.partitionBy("url").orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    decided = (
        matched.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (~F.col("allow")))
        .select("url")
    )
    return decided


def decide_round(
    pending: DataFrame,
    host_state: DataFrame,
    rules: DataFrame | None,
    round_seconds: int,
) -> DataFrame:
    """A10+A11+A12 fused into ONE host-partitioned pipeline.

    Returns every PENDING row with decision flags:
      blocked   — robots-disallowed (A10; longest-prefix, tie -> Allow)
      eligible  — competes for admission this round (not blocked; host's
                  robots known, or the row IS the robots fetch)
      admit     — within the host's token quota this round (A11/A12)
      tokens_refilled / n_elig — the token-bucket state the round loop
                  turns into host_state updates

    One persisted result replaces the three separate jobs (blocked
    count, admitted count, pending count) the loop used to run: all
    counts come from a single aggregation over this DataFrame.  The
    blocked decision is a hash-aggregate (max over (prefix_len, allow)
    structs == longest-prefix-wins, tie -> Allow), not a window sort.
    Admission ranks eligible rows first inside the host window, so
    ``row_number() <= quota`` admits exactly the per-host top-k of the
    eligible subset.  Semantics identical to oracle.crawl steps 1–2
    (differentially tested)."""
    cand = pending.join(
        F.broadcast(
            host_state.select("host", "tokens", "crawl_delay", "robots_done")
        ),
        "host",
    )
    if rules is None:
        cand = cand.withColumn("blocked", F.lit(False))
    else:
        verdict = (
            pending.filter(F.col("page_type") != "robots")
            .select("url", "host", path_query_expr(F.col("url")).alias("pq"))
            .join(F.broadcast(rules), ["host"])
            .where(F.col("pq").startswith(F.col("prefix")))
            .groupBy("url")
            .agg(F.max(F.struct(F.length("prefix").alias("l"), "allow")).alias("m"))
            .select("url", (~F.col("m.allow")).alias("_disallowed"))
        )
        cand = cand.join(verdict, "url", "left").withColumn(
            "blocked",
            F.col("robots_done")
            & (F.col("page_type") != "robots")
            & F.coalesce(F.col("_disallowed"), F.lit(False)),
        ).drop("_disallowed")

    eligible = (
        ~F.col("blocked")
        & (F.col("robots_done") | (F.col("page_type") == "robots"))
    )
    refill = F.lit(float(round_seconds)) / F.col("crawl_delay")
    cand = cand.withColumn("eligible", eligible).withColumn(
        "tokens_refilled",
        F.least(F.lit(TOKEN_BURST_FACTOR) * refill, F.col("tokens") + refill),
    ).withColumn("quota", F.floor("tokens_refilled").cast("long"))
    # per-host eligible count via partial-aggregated groupBy + broadcast
    # join back — NOT a host window, which would drag every row of the
    # hot host into one task (the single-host skew is by construction)
    elig_counts = (
        cand.where(F.col("eligible"))
        .groupBy("host")
        .agg(F.count("*").alias("n_elig"))
    )
    cand = cand.join(F.broadcast(elig_counts), "host", "left").withColumn(
        "n_elig", F.coalesce(F.col("n_elig"), F.lit(0))
    )
    # Hot-host guard: the per-host top-k sort is only needed when the
    # quota actually binds (n_elig > quota).  In the common saturated
    # case quota covers every candidate, and ranking the single hot
    # host's millions of rows in one window task would serialize the
    # round — so unconstrained hosts admit all eligible rows with no
    # sort, and the ranking window runs only over constrained hosts'
    # rows (empty in the steady state).  Host-level branch choice can't
    # depend on partitioning, so determinism is preserved.
    unconstrained = cand.where(F.col("n_elig") <= F.col("quota")).withColumn(
        "admit", F.col("eligible") & (F.col("n_elig") > 0)
    )
    w_rank = Window.partitionBy("host").orderBy(
        F.col("eligible").desc(), *order_key(cand)
    )
    constrained = (
        cand.where(F.col("n_elig") > F.col("quota"))
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn(
            "admit",
            F.col("eligible") & (F.col("n_elig") > 0) & (F.col("rn") <= F.col("quota")),
        )
        .drop("rn")
    )
    return unconstrained.unionByName(constrained).drop("quota", "robots_done")


def host_updates_from_decided(decided: DataFrame) -> DataFrame:
    """(host, tokens_after) for hosts that had candidates this round —
    hosts without candidates do not refill (oracle parity)."""
    return (
        decided.where(F.col("n_elig") > 0)
        .groupBy("host")
        .agg(
            (
                F.first("tokens_refilled")
                - F.sum(F.col("admit").cast("long"))
            ).alias("tokens_after")
        )
    )


def admit(
    pending: DataFrame,
    host_state: DataFrame,
    round_seconds: int,
) -> tuple[DataFrame, DataFrame]:
    """One round of token-bucket admission.

    Returns (admitted rows, host token/refill updates).  Candidates per
    host are its robots row(s) until robots_done, else all pending rows;
    hosts WITHOUT candidates this round do not refill (oracle parity).
    """
    cand = pending.join(
        F.broadcast(host_state.select("host", "tokens", "crawl_delay", "robots_done")),
        "host",
    ).where(F.col("robots_done") | (F.col("page_type") == "robots"))

    refill = F.lit(float(round_seconds)) / F.col("crawl_delay")
    budgets = (
        cand.groupBy("host")
        .agg(
            F.count("*").alias("n_cand"),
            F.first("tokens").alias("tokens"),
            F.first("crawl_delay").alias("crawl_delay"),
        )
        .withColumn(
            "tokens_refilled",
            F.least(F.lit(TOKEN_BURST_FACTOR) * refill, F.col("tokens") + refill),
        )
        .withColumn("quota", F.floor("tokens_refilled").cast("int"))
    )

    w = Window.partitionBy("host").orderBy(*order_key(cand))
    admitted = (
        cand.join(F.broadcast(budgets.select("host", "quota")), "host")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("quota"))
        .drop("rn", "quota", "tokens", "crawl_delay", "robots_done")
    )
    spent = admitted.groupBy("host").agg(F.count("*").alias("n_admitted"))
    host_updates = (
        budgets.join(spent, "host", "left")
        .withColumn(
            "tokens_after",
            F.col("tokens_refilled") - F.coalesce(F.col("n_admitted"), F.lit(0)),
        )
        .select("host", "tokens_after")
    )
    return admitted, host_updates
